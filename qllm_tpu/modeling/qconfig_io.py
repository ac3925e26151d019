"""Quantize-config dialect reader/writer.

Reference qllm/modeling/config.py:81-119 resolves three dialects:
  1. QLLM ``quant_config.json``             {"version": "GEMM"/"GPTQ"/..., ...}
  2. AutoGPTQ ``quantize_config.json``      (version-less -> GPTQ layout,
     zeros stored -1: sets the compat flag, config.py:111-116)
  3. HF-embedded ``config.json:quantization_config`` (quant_method:
     "gptq" / "awq")

plus the per-layer table ``quant_config_by_layer.json`` for mixed bits.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

__all__ = ["BaseQuantizeConfig"]


@dataclasses.dataclass
class BaseQuantizeConfig:
    bits: int = 4
    group_size: int = 128
    quant_method: str = "gptq"
    pack_mode: str = "GPTQ"  # layout the checkpoint tensors are stored in
    sym: bool = False
    desc_act: bool = False  # act_order
    compatible_with_autogptq: bool = False
    layer_configs: Dict[str, Dict[str, Any]] = dataclasses.field(
        default_factory=dict
    )

    def bits_of(self, layer_name: str) -> int:
        c = self.layer_configs.get(layer_name)
        return int(c.get("wbits", c.get("bits", self.bits))) if c else self.bits

    def groupsize_of(self, layer_name: str) -> int:
        c = self.layer_configs.get(layer_name)
        return (
            int(c.get("groupsize", c.get("group_size", self.group_size)))
            if c
            else self.group_size
        )

    # -- readers ------------------------------------------------------------

    @classmethod
    def from_pretrained(cls, path: str) -> "BaseQuantizeConfig":
        qc = os.path.join(path, "quant_config.json")
        agq = os.path.join(path, "quantize_config.json")
        hf = os.path.join(path, "config.json")
        if os.path.exists(qc):
            conf = cls._from_qllm(_load(qc))
        elif os.path.exists(agq):
            conf = cls._from_autogptq(_load(agq))
        elif os.path.exists(hf) and "quantization_config" in _load(hf):
            conf = cls._from_hf(_load(hf)["quantization_config"])
        else:
            raise FileNotFoundError(
                f"no quant config found under {path} "
                "(quant_config.json / quantize_config.json / "
                "config.json:quantization_config)"
            )
        by_layer = os.path.join(path, "quant_config_by_layer.json")
        if os.path.exists(by_layer):
            data = _load(by_layer)
            conf.layer_configs = {
                k: v for k, v in data.items() if isinstance(v, dict)
            }
        return conf

    @classmethod
    def _from_qllm(cls, d: Dict[str, Any]) -> "BaseQuantizeConfig":
        version = d.get("version", "GPTQ")
        method = d.get("quant_method", _method_of_version(version))
        return cls(
            bits=int(d.get("bits", d.get("w_bit", d.get("wbits", 4)))),
            group_size=int(d.get("group_size", d.get("q_group_size", 128))),
            quant_method=method,
            pack_mode=version,
            sym=bool(d.get("sym", False)),
            desc_act=bool(d.get("desc_act", d.get("act_order", False))),
        )

    @classmethod
    def _from_autogptq(cls, d: Dict[str, Any]) -> "BaseQuantizeConfig":
        # version-less config => AutoGPTQ: GPTQ layout, zeros stored -1
        # (reference config.py:111-116 sets COMPATIBLE_WITH_AUTOGPTQ)
        return cls(
            bits=int(d.get("bits", 4)),
            group_size=int(d.get("group_size", 128)),
            quant_method="gptq",
            pack_mode=d.get("version", "GPTQ"),
            sym=bool(d.get("sym", False)),
            desc_act=bool(d.get("desc_act", False)),
            compatible_with_autogptq="version" not in d,
        )

    @classmethod
    def _from_hf(cls, d: Dict[str, Any]) -> "BaseQuantizeConfig":
        method = d.get("quant_method", "gptq")
        pack = {"gptq": "GPTQ", "awq": "GEMM"}.get(method, "GPTQ")
        if method == "awq" and d.get("version", "gemm").lower() == "gemv":
            pack = "GEMV"
        return cls(
            bits=int(d.get("bits", d.get("w_bit", 4))),
            group_size=int(d.get("group_size", d.get("q_group_size", 128))),
            quant_method=method,
            pack_mode=pack,
            sym=bool(d.get("sym", False)),
            desc_act=bool(d.get("desc_act", False)),
            compatible_with_autogptq=(method == "gptq"),
        )

    # -- writer -------------------------------------------------------------

    def save_pretrained(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        d = {
            "bits": self.bits,
            "group_size": self.group_size,
            "quant_method": self.quant_method,
            "version": self.pack_mode,
            "sym": self.sym,
            "desc_act": self.desc_act,
            "producer": "qllm_tpu",
        }
        with open(os.path.join(path, "quant_config.json"), "w") as f:
            json.dump(d, f, indent=2)
        # AutoGPTQ-compatible sibling (reference writes both,
        # modeling/base.py:324-336)
        if self.pack_mode == "GPTQ":
            with open(os.path.join(path, "quantize_config.json"), "w") as f:
                json.dump(
                    {
                        "bits": self.bits,
                        "group_size": self.group_size,
                        "sym": self.sym,
                        "desc_act": self.desc_act,
                        "version": "GPTQ",
                    },
                    f,
                    indent=2,
                )
        if self.layer_configs:
            with open(
                os.path.join(path, "quant_config_by_layer.json"), "w"
            ) as f:
                json.dump(self.layer_configs, f, indent=2)


def _method_of_version(version: str) -> str:
    v = version.upper()
    if v in ("GEMM", "GEMV"):
        return "awq"
    if v == "HQQ":
        return "hqq"
    if v == "VPTQ":
        return "vptq"
    return "gptq"


def _load(p: str) -> Dict[str, Any]:
    with open(p) as f:
        return json.load(f)
