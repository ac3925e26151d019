"""Quantization method configs (reference qllm/quantization/config_builder.py).

Frozen dataclasses per method, plus the unified ``MetaConfig`` accessor
(reference config_builder.py:6-28) and ``build_config(args)``
(config_builder.py:137-159) that maps parsed CLI/FakeArgs onto a config.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional

__all__ = [
    "MetaConfig",
    "GPTQConfig",
    "AWQConfig",
    "HQQConfig",
    "VPTQConfig",
    "build_config",
]


@dataclasses.dataclass(frozen=True)
class MetaConfig:
    """Unified (bits, group_size, method) view every consumer can rely on."""

    bits: int
    group_size: int
    quant_method: str


class _ToMeta:
    def to_meta(self) -> MetaConfig:
        return MetaConfig(
            bits=getattr(self, "wbits", getattr(self, "bits", 16)),
            group_size=getattr(self, "groupsize", getattr(self, "group_size", -1)),
            quant_method=self.quant_method,
        )

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


@dataclasses.dataclass(frozen=True)
class GPTQConfig(_ToMeta):
    wbits: int = 4
    groupsize: int = 128
    nsamples: int = 128
    percdamp: float = 0.01
    sym: bool = False
    act_order: bool = False
    true_sequential: bool = False
    static_groups: bool = False
    allow_mix_bits: bool = False
    mix_qlayer_conf: Optional[Dict[str, Any]] = None
    # MSE grid search for scale/zero (reference _gptq_quantizer.py:74-91:
    # shrink [wmin, wmax] by p = 1 - i/grid and keep the per-channel best
    # under the L^norm error). Off by default, like the reference
    # (quantizer.configure(..., mse=False), gptq.py:60).
    mse: bool = False
    mse_maxshrink: float = 0.8
    mse_grid: int = 100
    mse_norm: float = 2.4
    quant_method: str = "gptq"


@dataclasses.dataclass(frozen=True)
class AWQConfig(_ToMeta):
    wbits: int = 4
    groupsize: int = 128
    # reference caps AWQ calibration at 64 samples (auto_model_quantization.py:211-213)
    nsamples: int = 64
    sym: bool = False
    quant_method: str = "awq"


@dataclasses.dataclass(frozen=True)
class HQQConfig(_ToMeta):
    wbits: int = 4
    groupsize: int = 128
    quant_zero: bool = False
    quant_scale: bool = False
    iters: int = 20
    lp_norm: float = 0.7
    beta: float = 10.0
    kappa: float = 1.01
    quant_method: str = "hqq"


@dataclasses.dataclass(frozen=True)
class VPTQConfig(_ToMeta):
    wbits: int = 2
    groupsize: int = -1
    vector_len: int = 8
    num_centroids: int = 65536
    num_res_centroids: int = 256
    npercent: float = 1.0
    group_num: int = 1
    kmeans_iters: int = 20
    enable_perm: bool = True
    hessian_ctx_size: int = 2048
    nsamples: int = 32
    config_for_layers: Optional[Dict[str, Any]] = None
    quant_method: str = "vptq"


_METHOD_TO_CONFIG = {
    "gptq": GPTQConfig,
    "awq": AWQConfig,
    "hqq": HQQConfig,
    "vptq": VPTQConfig,
}


def build_config(args) -> Any:
    """args (argparse Namespace or FakeArgs) -> method config.

    Reference behavior: config_builder.py:137-159 plus the AWQ nsamples
    cap from auto_model_quantization.py:211-213.
    """
    method = args.quant_method
    if method == "gptq":
        return GPTQConfig(
            wbits=args.wbits,
            groupsize=args.groupsize,
            nsamples=args.nsamples,
            percdamp=getattr(args, "percdamp", 0.01),
            sym=getattr(args, "sym", False),
            act_order=getattr(args, "act_order", False),
            true_sequential=getattr(args, "true_sequential", False),
            static_groups=getattr(args, "static_groups", False),
            allow_mix_bits=getattr(args, "allow_mix_bits", False),
            mix_qlayer_conf=_load_json_arg(getattr(args, "mix_qlayer_conf", None)),
            mse=getattr(args, "mse", False),
        )
    if method == "awq":
        return AWQConfig(
            wbits=args.wbits,
            groupsize=args.groupsize,
            nsamples=min(args.nsamples, 64),
            sym=getattr(args, "sym", False),
        )
    if method == "hqq":
        return HQQConfig(wbits=args.wbits, groupsize=args.groupsize)
    if method == "vptq":
        extra = _load_json_arg(getattr(args, "quant_config", None)) or {}
        fields = {f.name for f in dataclasses.fields(VPTQConfig)}
        return VPTQConfig(**{k: v for k, v in extra.items() if k in fields})
    raise ValueError(f"unknown quant_method: {method}")


def _load_json_arg(v):
    if v is None or isinstance(v, dict):
        return v
    with open(v) as f:
        return json.load(f)
