"""AutoQuantizedModelForCausalLM: checkpoint save / load / import.

The analog of reference qllm/modeling/base.py:
  * ``from_pretrained``  — float HF checkpoint (safetensors) -> params
    (auto-detects already-quantized checkpoints, base.py:204-205)
  * ``from_quantized``   — quantized checkpoint in ANY supported layout
    (QLLM / AutoGPTQ / AutoAWQ / ORT / Marlin) -> canonical params
  * ``save_pretrained``  — params -> safetensors in a chosen pack_mode
    + quant_config.json (+ AutoGPTQ-compatible quantize_config.json)

Checkpoint tensor naming follows the HF/AutoGPTQ convention
(model.layers.N.self_attn.q_proj.qweight etc.) so checkpoints
interchange with the CUDA ecosystem (reference README.md:111-126).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LINEAR_NAMES, ModelConfig
from ..quant.layouts import export_layout, import_layout
from ..quant.qtensor import QuantizedTensor
from .qconfig_io import BaseQuantizeConfig
from .registry import hf_config_dict, load_hf_config

__all__ = ["AutoQuantizedModelForCausalLM"]

_HF_PREFIX = {
    "q_proj": "self_attn.q_proj",
    "k_proj": "self_attn.k_proj",
    "v_proj": "self_attn.v_proj",
    "o_proj": "self_attn.o_proj",
    "gate_proj": "mlp.gate_proj",
    "up_proj": "mlp.up_proj",
    "down_proj": "mlp.down_proj",
}

_QUANT_SUFFIXES = ("qweight", "qzeros", "scales", "g_idx", "zeros")

# HF Mixtral expert naming: w1=gate, w2=down, w3=up
_MOE_WMAP = {"gate_proj": "w1", "down_proj": "w2", "up_proj": "w3"}
_VPTQ_SUFFIXES = (
    "indices",
    "centroids",
    "res_indices",
    "res_centroids",
    "outlier_ids",
    "outlier_weight",
    "vq_perm",
)


def _st_load(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    files = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors")
    )
    if not files:
        # legacy torch checkpoints (pytorch_model*.bin)
        bins = sorted(
            f
            for f in os.listdir(path)
            if f.startswith("pytorch_model") and f.endswith(".bin")
        )
        if bins:
            import torch

            for fname in bins:
                sd = torch.load(
                    os.path.join(path, fname),
                    map_location="cpu",
                    weights_only=True,
                )
                for k, v in sd.items():
                    out[k] = v.to(torch.float32).numpy() if v.dtype in (
                        torch.bfloat16,
                    ) else v.numpy()
            return out
        raise FileNotFoundError(
            f"no .safetensors or pytorch_model*.bin files under {path}"
        )
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for k in f.keys():
                try:
                    out[k] = f.get_tensor(k)
                except Exception:
                    # bf16 tensors: numpy backend may refuse; use flax
                    import safetensors.flax as stf

                    data = stf.load_file(os.path.join(path, fname))
                    for k2, v in data.items():
                        out[k2] = np.asarray(v)
                    break
    return out


def _st_save(tensors: Dict[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file

    # safetensors silently mis-serializes non-contiguous views (e.g. the
    # transposed outputs of the layout packers) — force C order.
    tensors = {k: np.ascontiguousarray(v) for k, v in tensors.items()}
    save_file(tensors, os.path.join(path, "model.safetensors"))


class AutoQuantizedModelForCausalLM:
    """Namespace-style API mirroring the reference class
    (modeling/base.py:175-336)."""

    # ------------------------------------------------------------------ load

    @classmethod
    def from_pretrained(
        cls, path: str, dtype=jnp.bfloat16
    ) -> Tuple[Dict[str, Any], ModelConfig]:
        """Load a float (or quantized — auto-detected) checkpoint dir."""
        with open(os.path.join(path, "config.json")) as f:
            hf_cfg = json.load(f)
        if "quantization_config" in hf_cfg or any(
            os.path.exists(os.path.join(path, n))
            for n in ("quant_config.json", "quantize_config.json")
        ):
            return cls.from_quantized(path, dtype=dtype)
        cfg = load_hf_config(path)
        tensors = _st_load(path)
        params = cls._float_params(tensors, cfg, dtype)
        return params, cfg

    @classmethod
    def from_quantized(
        cls, path: str, dtype=jnp.bfloat16
    ) -> Tuple[Dict[str, Any], ModelConfig]:
        cfg = load_hf_config(path)
        qconf = BaseQuantizeConfig.from_pretrained(path)
        tensors = _st_load(path)
        params = cls._float_params(
            tensors, cfg, dtype, skip_quantized=True
        )
        def load_one(base: str, lname: str):
            """-> imported tensor or None if not quantized at ``base``."""
            if qconf.pack_mode == "VPTQ":
                vq = {
                    suf: tensors.get(f"{base}.{suf}") for suf in _VPTQ_SUFFIXES
                }
                if vq["indices"] is None:
                    return None
                return cls._vptq_from_tensors(
                    vq, qconf.layer_configs.get(lname, {})
                )
            group = {
                suf: tensors[f"{base}.{suf}"]
                for suf in _QUANT_SUFFIXES
                if f"{base}.{suf}" in tensors
            }
            if "qweight" not in group:
                return None  # layer left unquantized (scanned like
                # reference base.py:265-279)
            qt = import_layout(
                group,
                qconf.pack_mode,
                qconf.bits_of(lname),
                qconf.groupsize_of(lname),
                autogptq=qconf.compatible_with_autogptq,
                sym=qconf.sym,
            )
            if (
                qt.bits in (3, 5, 6, 7)
                and jax.default_backend() not in ("cpu",)
                and not os.environ.get("QLLM_TPU_NO_PROMOTE")
            ):
                # odd widths have no fused kernel; repack at the next
                # power-of-two so serving rides the fast path
                # (disable with QLLM_TPU_NO_PROMOTE=1)
                from ..quant.qtensor import promote_bits

                qt = promote_bits(qt)
            return qt

        for i in range(cfg.num_hidden_layers):
            lp = params["layers"][i]
            for name in LINEAR_NAMES:
                w = load_one(
                    f"model.layers.{i}.{_HF_PREFIX[name]}",
                    f"model.layers.{i}.{name}",
                )
                if w is not None:
                    lp[name] = w
            for e, ep in enumerate(lp.get("experts", [])):
                for name, wtag in _MOE_WMAP.items():
                    w = load_one(
                        f"model.layers.{i}.block_sparse_moe.experts.{e}.{wtag}",
                        f"model.layers.{i}.experts.{e}.{name}",
                    )
                    if w is not None:
                        ep[name] = w
        return params, cfg

    # ------------------------------------------------------------------ save

    @classmethod
    def save_pretrained(
        cls,
        params: Dict[str, Any],
        cfg: ModelConfig,
        path: str,
        pack_mode: str = "GPTQ",
        quant_method: str = "gptq",
        layer_configs: Optional[Dict[str, Dict[str, int]]] = None,
        compatible_with_autogptq: Optional[bool] = None,
    ) -> None:
        os.makedirs(path, exist_ok=True)
        if not isinstance(params["layers"], list):
            raise ValueError(
                "params are layer-stacked (models.stacked); call "
                "unstack_layer_params(params, cfg.num_hidden_layers) "
                "before saving"
            )
        if compatible_with_autogptq is None:
            compatible_with_autogptq = bool(
                int(os.environ.get("COMPATIBLE_WITH_AUTOGPTQ", "0"))
            )
        tensors: Dict[str, np.ndarray] = {}
        bits_seen, gs_seen, sym_seen = set(), set(), set()
        layer_configs = dict(layer_configs or {})

        def put_dense(key, arr):
            tensors[key] = np.asarray(arr.astype(jnp.float16))

        put_dense("model.embed_tokens.weight", params["embed_tokens"])
        put_dense("model.norm.weight", params["norm"])
        if "lm_head" in params:
            # torch convention stores [out, in]
            put_dense("lm_head.weight", params["lm_head"].T)
        for i, lp in enumerate(params["layers"]):
            pre = f"model.layers.{i}"
            put_dense(f"{pre}.input_layernorm.weight", lp["input_layernorm"])
            put_dense(
                f"{pre}.post_attention_layernorm.weight",
                lp["post_attention_layernorm"],
            )
            if "router" in lp:
                put_dense(f"{pre}.block_sparse_moe.gate.weight", lp["router"].T)
            moe_items = [
                (
                    f"{pre}.block_sparse_moe.experts.{e}.{_MOE_WMAP[name]}",
                    f"model.layers.{i}.experts.{e}.{name}",
                    ep[name],
                    None,
                )
                for e, ep in enumerate(lp.get("experts", []))
                for name in ("gate_proj", "up_proj", "down_proj")
                if name in ep
            ]
            dense_items = [
                (
                    f"{pre}.{_HF_PREFIX[name]}",
                    f"model.layers.{i}.{name}",
                    lp[name],
                    lp.get(f"{name}_bias"),
                )
                for name in LINEAR_NAMES
                if name in lp
            ]
            for base, lname, w, bias in dense_items + moe_items:
                if bias is not None:
                    put_dense(f"{base}.bias", bias)
                from ..quant.vptq import VPTQTensor

                if isinstance(w, QuantizedTensor):
                    exported = export_layout(
                        w, pack_mode, autogptq=compatible_with_autogptq
                    )
                    for suf, arr in exported.items():
                        tensors[f"{base}.{suf}"] = arr
                    bits_seen.add(w.bits)
                    gs_seen.add(w.group_size)
                    sym_seen.add(w.sym)
                    layer_configs.setdefault(
                        lname,
                        {"wbits": w.bits, "groupsize": w.group_size},
                    )
                elif isinstance(w, VPTQTensor):
                    pack_mode = "VPTQ"
                    vq = {
                        "indices": np.asarray(w.indices).astype(np.int32),
                        "centroids": np.asarray(w.centroids),
                        "res_indices": w.res_indices,
                        "res_centroids": w.res_centroids,
                        "outlier_ids": w.outlier_ids,
                        "outlier_weight": w.outlier_weight,
                        "vq_perm": w.perm,
                    }
                    for suf, arr in vq.items():
                        if arr is not None:
                            tensors[f"{base}.{suf}"] = np.asarray(arr)
                    # merge (not setdefault): quantizer-provided configs
                    # may lack the structural fields needed to rebuild
                    lc = layer_configs.setdefault(lname, {})
                    lc.update(
                        vector_len=w.vector_len,
                        n_outlier=w.n_outlier,
                        in_features=w.in_features,
                        out_features=w.out_features,
                    )
                else:
                    put_dense(f"{base}.weight", w.T)
        _st_save(tensors, path)
        qconf = BaseQuantizeConfig(
            bits=max(bits_seen) if bits_seen else 16,
            group_size=min(gs_seen) if gs_seen else -1,
            quant_method=quant_method,
            pack_mode=pack_mode.upper(),
            sym=all(sym_seen) if sym_seen else False,
            compatible_with_autogptq=compatible_with_autogptq,
            layer_configs=layer_configs,
        )
        qconf.save_pretrained(path)
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(hf_config_dict(cfg), f, indent=2)

    # ------------------------------------------------------------------ misc

    @staticmethod
    def _vptq_from_tensors(vq: Dict[str, Optional[np.ndarray]], meta: Dict):
        from ..quant.vptq import VPTQTensor

        indices = jnp.asarray(np.asarray(vq["indices"]), jnp.int32)
        centroids = jnp.asarray(np.asarray(vq["centroids"]))
        v = meta.get("vector_len", centroids.shape[-1])
        n_out = int(meta.get("n_outlier", 0))
        N = indices.shape[0]
        K = meta.get("in_features", indices.shape[1] * v + n_out)
        return VPTQTensor(
            indices=indices,
            centroids=centroids,
            res_indices=None
            if vq["res_indices"] is None
            else jnp.asarray(np.asarray(vq["res_indices"]), jnp.int32),
            res_centroids=None
            if vq["res_centroids"] is None
            else jnp.asarray(np.asarray(vq["res_centroids"])),
            outlier_ids=None
            if vq["outlier_ids"] is None
            else jnp.asarray(np.asarray(vq["outlier_ids"]), jnp.int32),
            outlier_weight=None
            if vq["outlier_weight"] is None
            else jnp.asarray(np.asarray(vq["outlier_weight"])),
            perm=None
            if vq["vq_perm"] is None
            else jnp.asarray(np.asarray(vq["vq_perm"]), jnp.int32),
            vector_len=int(v),
            in_features=int(K),
            out_features=int(meta.get("out_features", N)),
            n_outlier=n_out,
        )

    @staticmethod
    def _float_params(
        tensors: Dict[str, np.ndarray],
        cfg: ModelConfig,
        dtype,
        skip_quantized: bool = False,
    ) -> Dict[str, Any]:
        def get(key):
            return jnp.asarray(np.asarray(tensors[key])).astype(dtype)

        params: Dict[str, Any] = {
            "embed_tokens": get("model.embed_tokens.weight"),
            "norm": get("model.norm.weight"),
            "layers": [],
        }
        if "lm_head.weight" in tensors:
            params["lm_head"] = get("lm_head.weight").T  # -> [K, N]
        for i in range(cfg.num_hidden_layers):
            pre = f"model.layers.{i}"
            lp: Dict[str, Any] = {
                "input_layernorm": get(f"{pre}.input_layernorm.weight"),
                "post_attention_layernorm": get(
                    f"{pre}.post_attention_layernorm.weight"
                ),
            }
            for name in LINEAR_NAMES:
                base = f"{pre}.{_HF_PREFIX[name]}"
                if f"{base}.weight" in tensors:
                    lp[name] = get(f"{base}.weight").T
                elif skip_quantized and f"{base}.qweight" in tensors:
                    lp[name] = None  # placeholder; filled by from_quantized
                if f"{base}.bias" in tensors:
                    lp[f"{name}_bias"] = get(f"{base}.bias")
            router_key = f"{pre}.block_sparse_moe.gate.weight"
            if router_key in tensors:  # Mixtral MoE layer
                lp["router"] = get(router_key).T
                experts = []
                e = 0
                while True:
                    ebase = f"{pre}.block_sparse_moe.experts.{e}"
                    if not any(
                        k.startswith(ebase + ".") for k in tensors
                    ):
                        break
                    ep = {}
                    for name, w in _MOE_WMAP.items():
                        key = f"{ebase}.{w}.weight"
                        if key in tensors:
                            ep[name] = get(key).T
                        elif skip_quantized and f"{ebase}.{w}.qweight" in tensors:
                            ep[name] = None
                    experts.append(ep)
                    e += 1
                lp["experts"] = experts
            params["layers"].append(lp)
        return params
