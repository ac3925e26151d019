"""AutoQuantizedModelForCausalLM: checkpoint save / load / import.

The analog of reference qllm/modeling/base.py:
  * ``from_pretrained``  — float HF checkpoint (safetensors) -> params
    (auto-detects already-quantized checkpoints, base.py:204-205)
  * ``from_quantized``   — quantized checkpoint in ANY supported layout
    (QLLM / AutoGPTQ / AutoAWQ / ORT / Marlin) -> canonical params
  * ``save_pretrained``  — params -> safetensors in a chosen pack_mode
    + quant_config.json (+ AutoGPTQ-compatible quantize_config.json)

Tensor naming follows each architecture's native HF dialect
(modeling.archs.ArchSpec) so checkpoints interchange with the CUDA
ecosystem (reference README.md:111-126): llama-family uses
``model.layers.N.self_attn.q_proj.qweight``, bloom uses
``transformer.h.N.self_attention.query_key_value.qweight`` (fused —
split/refused exactly via column indices), etc.
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
from ..quant.qtensor import QuantizedTensor, concat_columns, take_columns
from .archs import (
    ArchSpec,
    gate_up_split_indices,
    qkv_split_indices,
    spec_for_config,
    spec_from_model_config,
)
from .qconfig_io import BaseQuantizeConfig
from .registry import hf_config_dict

__all__ = ["AutoQuantizedModelForCausalLM"]

_QUANT_SUFFIXES = ("qweight", "qzeros", "scales", "g_idx", "zeros")

# HF Mixtral expert naming: w1=gate, w2=down, w3=up
_MOE_WMAP = {"gate_proj": "w1", "down_proj": "w2", "up_proj": "w3"}
_SHARED_NAMES = ("gate_proj", "up_proj", "down_proj")


def _moe_naming(spec: ArchSpec) -> Tuple[str, Dict[str, str], str]:
    """(per-layer MoE module prefix, canonical->checkpoint name map,
    shared-expert submodule name). Internally shared experts always live
    under the canonical key "shared_experts"; only the checkpoint
    spelling differs (qwen2-moe uses a singular mlp.shared_expert)."""
    if spec.moe_dialect == "deepseek":
        return "mlp", {n: n for n in _SHARED_NAMES}, "shared_experts"
    if spec.moe_dialect == "qwen2_moe":
        return "mlp", {n: n for n in _SHARED_NAMES}, "shared_expert"
    return "block_sparse_moe", _MOE_WMAP, "shared_experts"
_QKV = ("q_proj", "k_proj", "v_proj")
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


def _load_config_dict(path: str) -> dict:
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)


def _remap_legacy_llava(tensors: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Pre-transformers-4.52 llava checkpoints keyed the language tower
    as ``language_model.model.*`` (and kept the vision parts unprefixed);
    normalize to the current ``model.language_model.*`` dialect."""
    if any(k.startswith("model.language_model.") for k in tensors):
        return tensors
    if not any(k.startswith("language_model.") for k in tensors):
        return tensors
    out = {}
    for k, v in tensors.items():
        if k.startswith("language_model.model."):
            out["model.language_model." + k[len("language_model.model.") :]] = v
        elif k.startswith("language_model.lm_head."):
            out["lm_head." + k[len("language_model.lm_head.") :]] = v
        elif k.startswith(
            ("vision_tower.", "multi_modal_projector.", "image_newline")
        ):
            out["model." + k] = v
        else:
            out[k] = v
    return out


class AutoQuantizedModelForCausalLM:
    """Namespace-style API mirroring the reference class
    (modeling/base.py:175-336)."""

    # ------------------------------------------------------------------ load

    @classmethod
    def from_pretrained(
        cls, path: str, dtype=jnp.bfloat16
    ) -> Tuple[Dict[str, Any], ModelConfig]:
        """Load a float (or quantized — auto-detected) checkpoint dir."""
        hf_cfg = _load_config_dict(path)
        if "quantization_config" in hf_cfg or any(
            os.path.exists(os.path.join(path, n))
            for n in ("quant_config.json", "quantize_config.json")
        ):
            return cls.from_quantized(path, dtype=dtype)
        spec = spec_for_config(hf_cfg)
        cfg = spec.config_fn(hf_cfg)
        tensors = _st_load(path)
        if spec.passthrough:
            tensors = _remap_legacy_llava(tensors)
        if spec.kind == "llama" and spec.embed not in tensors:
            # generic-fallback arch with renamed prefixes: sniff them
            from .archs import sniff_llama_layout

            spec = sniff_llama_layout(tensors, spec)
        params = cls._float_params(tensors, cfg, spec, dtype)
        if spec.passthrough:
            # keep the wrapper's own config (nested vision config etc.)
            # so save_pretrained round-trips the full multimodal model
            params["hf_config"] = hf_cfg
        return params, cfg

    @classmethod
    def from_quantized(
        cls, path: str, dtype=jnp.bfloat16
    ) -> Tuple[Dict[str, Any], ModelConfig]:
        from .archs import model_config_from_hf_dict

        hf_cfg = _load_config_dict(path)
        spec = spec_for_config(hf_cfg)
        cfg = model_config_from_hf_dict(hf_cfg)
        qconf = BaseQuantizeConfig.from_pretrained(path)
        tensors = _st_load(path)
        if spec.passthrough:
            tensors = _remap_legacy_llava(tensors)
        if spec.kind == "llama" and spec.embed not in tensors:
            from .archs import sniff_llama_layout

            spec = sniff_llama_layout(tensors, spec)
        params = cls._float_params(
            tensors, cfg, spec, dtype, skip_quantized=True
        )
        if spec.passthrough:
            params["hf_config"] = hf_cfg

        def import_group(base: str, lname: str):
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
            return import_layout(
                group,
                qconf.pack_mode,
                qconf.bits_of(lname),
                qconf.groupsize_of(lname),
                autogptq=qconf.compatible_with_autogptq,
                sym=qconf.sym,
            )

        def maybe_promote(qt):
            if (
                isinstance(qt, QuantizedTensor)
                and qt.bits in (3, 5, 6, 7)
                and jax.default_backend() not in ("cpu",)
                and not os.environ.get("QLLM_TPU_NO_PROMOTE")
            ):
                from ..ops.pallas_qmm import odd_stacked_kernel_ok

                if odd_stacked_kernel_ok(
                    qt.in_features, qt.group_size
                ) and not os.environ.get("QLLM_TPU_FORCE_PROMOTE"):
                    # the fused bit-plane decode kernel serves this
                    # geometry at packed bytes — keep the odd width
                    return qt
                # no kernel for this geometry: repack at the next
                # power-of-two so serving rides the fast path
                # (disable with QLLM_TPU_NO_PROMOTE=1)
                from ..quant.qtensor import promote_bits

                return promote_bits(qt)
            return qt

        def fill_fused(lp, lbase, i, fused_path, names, indices):
            """Load a fused projection: split-saved sub-names first (our
            act_order fallback dialect), else the fused native tensor
            split by column indices."""
            found = False
            for name in names:
                w = import_group(
                    f"{lbase}.{fused_path}.{name}",
                    f"model.layers.{i}.{name}",
                )
                if w is not None:
                    lp[name] = maybe_promote(w)
                    found = True
            if found:
                return
            qt = import_group(
                f"{lbase}.{fused_path}", f"model.layers.{i}.{names[0]}"
            )
            if qt is None:
                return
            if not isinstance(qt, QuantizedTensor):
                raise NotImplementedError(
                    "fused projections in VPTQ checkpoints are stored "
                    "split; found a fused VPTQ tensor"
                )
            for name, idx in zip(names, indices):
                lp[name] = maybe_promote(take_columns(qt, idx))

        for i in range(cfg.num_hidden_layers):
            lbase = f"{spec.layers_prefix}.{i}"
            lp = params["layers"][i]
            for name, rel in spec.linears.items():
                w = import_group(
                    f"{lbase}.{rel}", f"model.layers.{i}.{name}"
                )
                if w is not None:
                    lp[name] = maybe_promote(w)
            if spec.fused_qkv is not None:
                fill_fused(
                    lp, lbase, i, spec.fused_qkv, _QKV, qkv_split_indices(cfg)
                )
            if spec.fused_gate_up is not None:
                fill_fused(
                    lp,
                    lbase,
                    i,
                    spec.fused_gate_up,
                    ("gate_proj", "up_proj"),
                    gate_up_split_indices(cfg),
                )
            moe_prefix, wmap, shared_rel = _moe_naming(spec)
            for e, ep in enumerate(lp.get("experts", [])):
                for name, wtag in wmap.items():
                    w = import_group(
                        f"{lbase}.{moe_prefix}.experts.{e}.{wtag}",
                        f"model.layers.{i}.experts.{e}.{name}",
                    )
                    if w is not None:
                        ep[name] = maybe_promote(w)
            se = lp.get("shared_experts")
            if se is not None:
                for name in _SHARED_NAMES:
                    w = import_group(
                        f"{lbase}.{moe_prefix}.{shared_rel}.{name}",
                        f"model.layers.{i}.shared_experts.{name}",
                    )
                    if w is not None:
                        se[name] = maybe_promote(w)
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
        spec = spec_from_model_config(cfg)
        if compatible_with_autogptq is None:
            compatible_with_autogptq = bool(
                int(os.environ.get("COMPATIBLE_WITH_AUTOGPTQ", "0"))
            )
        tensors: Dict[str, np.ndarray] = {}
        bits_seen, gs_seen, sym_seen = set(), set(), set()
        layer_configs = dict(layer_configs or {})
        saved_pack_mode = [pack_mode]

        def put_dense(key, arr, transpose=False):
            arr = arr.T if transpose else arr
            tensors[key] = np.asarray(arr.astype(jnp.float16))

        def put_weight(base, w, bias=None):
            """Dense linear in torch convention ([out, in]; Conv1D archs
            keep [in, out])."""
            put_dense(f"{base}.weight", w, transpose=not spec.conv1d)
            if bias is not None:
                put_dense(f"{base}.bias", bias)

        def put_quantized(base, lname, w: QuantizedTensor):
            exported = export_layout(
                w, saved_pack_mode[0], autogptq=compatible_with_autogptq
            )
            for suf, arr in exported.items():
                tensors[f"{base}.{suf}"] = arr
            bits_seen.add(w.bits)
            gs_seen.add(w.group_size)
            sym_seen.add(w.sym)
            layer_configs.setdefault(
                lname, {"wbits": w.bits, "groupsize": w.group_size}
            )

        def put_vptq(base, lname, w):
            saved_pack_mode[0] = "VPTQ"
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
            lc = layer_configs.setdefault(lname, {})
            lc.update(
                vector_len=w.vector_len,
                n_outlier=w.n_outlier,
                in_features=w.in_features,
                out_features=w.out_features,
            )

        def put_any(base, lname, w, bias=None):
            from ..quant.vptq import VPTQTensor

            if isinstance(w, QuantizedTensor):
                put_quantized(base, lname, w)
            elif isinstance(w, VPTQTensor):
                put_vptq(base, lname, w)
            else:
                put_weight(base, w, bias)
                return
            if bias is not None:
                put_dense(f"{base}.bias", bias)

        def put_fused(lbase, i, fused_path, names, indices, n_total):
            """Save a fused projection in its native fused form when the
            parts re-fuse exactly; act_order (per-part K perms) falls
            back to split sub-names which from_quantized understands."""
            parts = [params["layers"][i].get(n) for n in names]
            parts = [p for p in parts if p is not None]
            if len(parts) != len(names):
                return
            lp = params["layers"][i]
            biases = [lp.get(f"{n}_bias") for n in names]
            base = f"{lbase}.{fused_path}"
            if all(not isinstance(p, QuantizedTensor) for p in parts) and all(
                not hasattr(p, "indices") for p in parts
            ):
                K = parts[0].shape[0]
                wf = jnp.zeros((K, n_total), parts[0].dtype)
                for p, idx in zip(parts, indices):
                    wf = wf.at[:, jnp.asarray(idx, jnp.int32)].set(p)
                bias = None
                if any(b is not None for b in biases):
                    bf = jnp.zeros((n_total,), parts[0].dtype)
                    for b, idx in zip(biases, indices):
                        if b is not None:
                            bf = bf.at[jnp.asarray(idx, jnp.int32)].set(b)
                    bias = bf
                put_weight(base, wf, bias)
                return
            if all(isinstance(p, QuantizedTensor) for p in parts):
                try:
                    fused = concat_columns(parts, indices, n_total)
                except ValueError:
                    fused = None
                if fused is not None:
                    put_quantized(
                        base, f"model.layers.{i}.{names[0]}", fused
                    )
                    for n in names[1:]:
                        layer_configs.setdefault(
                            n, {"wbits": fused.bits, "groupsize": fused.group_size}
                        )
                    if any(b is not None for b in biases):
                        bf = jnp.zeros((n_total,), jnp.float32)
                        for b, idx in zip(biases, indices):
                            if b is not None:
                                bf = bf.at[jnp.asarray(idx, jnp.int32)].set(
                                    b.astype(jnp.float32)
                                )
                        put_dense(f"{base}.bias", bf)
                    return
            # mixed or act_order: split sub-name dialect
            for name, p, b in zip(names, parts, biases):
                put_any(f"{base}.{name}", f"model.layers.{i}.{name}", p, b)

        put_dense(spec.embed, params["embed_tokens"])
        put_dense(f"{spec.final_norm}.weight", params["norm"])
        if "norm_bias" in params:
            put_dense(f"{spec.final_norm}.bias", params["norm_bias"])
        if spec.pos_embed and "pos_embed" in params:
            put_dense(spec.pos_embed, params["pos_embed"])
        if spec.embed_ln and "embed_layernorm" in params:
            put_dense(f"{spec.embed_ln}.weight", params["embed_layernorm"])
            if "embed_layernorm_bias" in params:
                put_dense(
                    f"{spec.embed_ln}.bias", params["embed_layernorm_bias"]
                )
        if "lm_head" in params and not cfg.tie_word_embeddings:
            if spec.lm_head is None:
                raise ValueError(f"{cfg.arch} never stores an lm_head")
            put_dense(f"{spec.lm_head}.weight", params["lm_head"], transpose=True)
            if "lm_head_bias" in params:
                put_dense(f"{spec.lm_head}.bias", params["lm_head_bias"])

        H, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd
        for i, lp in enumerate(params["layers"]):
            lbase = f"{spec.layers_prefix}.{i}"
            for cname, rel in spec.norms.items():
                if cname in lp:
                    put_dense(f"{lbase}.{rel}.weight", lp[cname])
                if f"{cname}_bias" in lp:
                    put_dense(f"{lbase}.{rel}.bias", lp[f"{cname}_bias"])
            for name, rel in spec.linears.items():
                if name in lp and lp[name] is not None:
                    put_any(
                        f"{lbase}.{rel}",
                        f"model.layers.{i}.{name}",
                        lp[name],
                        lp.get(f"{name}_bias"),
                    )
                if f"{name}_act_scale" in lp:
                    # AWQ ScaledActivation divider (reference stores it
                    # as the scales of an inserted module)
                    put_dense(
                        f"{lbase}.{rel}.act_scales",
                        lp[f"{name}_act_scale"],
                    )
            if spec.fused_qkv is not None:
                put_fused(
                    lbase,
                    i,
                    spec.fused_qkv,
                    _QKV,
                    qkv_split_indices(cfg),
                    (H + 2 * Hkv) * hd,
                )
            if spec.fused_gate_up is not None:
                put_fused(
                    lbase,
                    i,
                    spec.fused_gate_up,
                    ("gate_proj", "up_proj"),
                    gate_up_split_indices(cfg),
                    2 * cfg.intermediate_size,
                )
            moe_prefix, wmap, shared_rel = _moe_naming(spec)
            if "router" in lp:
                put_dense(
                    f"{lbase}.{moe_prefix}.gate.weight",
                    lp["router"],
                    transpose=True,
                )
            for e, ep in enumerate(lp.get("experts", [])):
                for name in _SHARED_NAMES:
                    if name in ep and ep[name] is not None:
                        put_any(
                            f"{lbase}.{moe_prefix}.experts.{e}."
                            f"{wmap[name]}",
                            f"model.layers.{i}.experts.{e}.{name}",
                            ep[name],
                        )
            for name, w in (lp.get("shared_experts") or {}).items():
                if w is not None:
                    put_any(
                        f"{lbase}.{moe_prefix}.{shared_rel}.{name}",
                        f"model.layers.{i}.shared_experts.{name}",
                        w,
                    )
            if lp.get("shared_expert_gate") is not None:
                put_dense(
                    f"{lbase}.{moe_prefix}.shared_expert_gate.weight",
                    lp["shared_expert_gate"],
                    transpose=True,
                )
        # multimodal passthrough (llava/llava-next): the non-language
        # tensors captured at load (vision tower, projector,
        # image_newline, ...) must round-trip — the reference saves the
        # whole HF module so its quantized llava checkpoints keep them
        extras = params.get("extra_tensors")
        if extras:
            for k, v in extras.items():
                tensors[k] = np.asarray(v)
        _st_save(tensors, path)
        qconf = BaseQuantizeConfig(
            bits=max(bits_seen) if bits_seen else 16,
            group_size=min(gs_seen) if gs_seen else -1,
            quant_method=quant_method,
            pack_mode=saved_pack_mode[0].upper(),
            sym=all(sym_seen) if sym_seen else False,
            compatible_with_autogptq=compatible_with_autogptq,
            layer_configs=layer_configs,
        )
        qconf.save_pretrained(path)
        # passthrough archs keep the wrapper's own nested config (vision
        # config, image grid, ...) — the normalized language-tower dict
        # would lose it and the checkpoint could not be reloaded as the
        # original multimodal architecture
        hf_cfg = params.get("hf_config")
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(
                hf_cfg if hf_cfg else hf_config_dict(cfg), f, indent=2
            )

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
        spec: ArchSpec,
        dtype,
        skip_quantized: bool = False,
    ) -> Dict[str, Any]:
        def get(key):
            return jnp.asarray(np.asarray(tensors[key])).astype(dtype)

        def get_w(key):
            """Linear weight in our [in, out] convention (torch stores
            [out, in]; Conv1D archs — gpt2 — store [in, out] already)."""
            w = get(key)
            return w if spec.conv1d else w.T

        params: Dict[str, Any] = {
            "embed_tokens": get(spec.embed),
            "norm": get(f"{spec.final_norm}.weight"),
            "layers": [],
        }
        if f"{spec.final_norm}.bias" in tensors:
            params["norm_bias"] = get(f"{spec.final_norm}.bias")
        if spec.pos_embed and spec.pos_embed in tensors:
            params["pos_embed"] = get(spec.pos_embed)
        if spec.embed_ln and f"{spec.embed_ln}.weight" in tensors:
            params["embed_layernorm"] = get(f"{spec.embed_ln}.weight")
            if f"{spec.embed_ln}.bias" in tensors:
                params["embed_layernorm_bias"] = get(f"{spec.embed_ln}.bias")
        if spec.lm_head and f"{spec.lm_head}.weight" in tensors:
            params["lm_head"] = get(f"{spec.lm_head}.weight").T  # -> [K, N]
            if f"{spec.lm_head}.bias" in tensors:
                params["lm_head_bias"] = get(f"{spec.lm_head}.bias")
        if spec.passthrough:
            extras = {
                k: np.asarray(v)
                for k, v in tensors.items()
                if k.startswith(spec.passthrough)
            }
            if extras:
                params["extra_tensors"] = extras

        def load_fused(lp, lbase, fused_path, names, indices):
            base = f"{lbase}.{fused_path}"
            if f"{base}.weight" in tensors:
                wf = get_w(f"{base}.weight")
                for name, idx in zip(names, indices):
                    lp[name] = wf[:, jnp.asarray(idx, jnp.int32)]
                if f"{base}.bias" in tensors:
                    bf = get(f"{base}.bias")
                    for name, idx in zip(names, indices):
                        lp[f"{name}_bias"] = bf[jnp.asarray(idx, jnp.int32)]
            elif skip_quantized and any(
                k.startswith(base + ".") for k in tensors
            ):
                for name in names:
                    lp.setdefault(name, None)
                if f"{base}.bias" in tensors:
                    bf = get(f"{base}.bias")
                    for name, idx in zip(names, indices):
                        lp[f"{name}_bias"] = bf[jnp.asarray(idx, jnp.int32)]

        for i in range(cfg.num_hidden_layers):
            lbase = f"{spec.layers_prefix}.{i}"
            lp: Dict[str, Any] = {}
            for cname, rel in spec.norms.items():
                if f"{lbase}.{rel}.weight" in tensors:
                    lp[cname] = get(f"{lbase}.{rel}.weight")
                if f"{lbase}.{rel}.bias" in tensors:
                    lp[f"{cname}_bias"] = get(f"{lbase}.{rel}.bias")
            for name, rel in spec.linears.items():
                base = f"{lbase}.{rel}"
                if f"{base}.weight" in tensors:
                    lp[name] = get_w(f"{base}.weight")
                elif skip_quantized and any(
                    k.startswith(base + ".") for k in tensors
                ):
                    lp[name] = None  # filled by from_quantized
                if f"{base}.bias" in tensors:
                    lp[f"{name}_bias"] = get(f"{base}.bias")
                if f"{base}.act_scales" in tensors:
                    lp[f"{name}_act_scale"] = get(f"{base}.act_scales")
            if spec.fused_qkv is not None:
                load_fused(
                    lp, lbase, spec.fused_qkv, _QKV, qkv_split_indices(cfg)
                )
            if spec.fused_gate_up is not None:
                load_fused(
                    lp,
                    lbase,
                    spec.fused_gate_up,
                    ("gate_proj", "up_proj"),
                    gate_up_split_indices(cfg),
                )
            moe_prefix, wmap, shared_rel = _moe_naming(spec)
            router_key = f"{lbase}.{moe_prefix}.gate.weight"
            if router_key in tensors:  # MoE layer (mixtral/deepseek/qwen-moe)
                lp["router"] = get(router_key).T
                experts = []
                e = 0
                while True:
                    ebase = f"{lbase}.{moe_prefix}.experts.{e}"
                    if not any(
                        k.startswith(ebase + ".") for k in tensors
                    ):
                        break
                    ep = {}
                    for name, w in wmap.items():
                        key = f"{ebase}.{w}.weight"
                        if key in tensors:
                            ep[name] = get(key).T
                        elif skip_quantized and any(
                            k.startswith(f"{ebase}.{w}.") for k in tensors
                        ):
                            ep[name] = None
                    experts.append(ep)
                    e += 1
                lp["experts"] = experts
                sbase = f"{lbase}.{moe_prefix}.{shared_rel}"
                if any(k.startswith(sbase + ".") for k in tensors):
                    se = {}
                    for name in _SHARED_NAMES:
                        key = f"{sbase}.{name}.weight"
                        if key in tensors:
                            se[name] = get(key).T
                        elif skip_quantized and any(
                            k.startswith(f"{sbase}.{name}.")
                            for k in tensors
                        ):
                            se[name] = None
                    lp["shared_experts"] = se
                gkey = f"{lbase}.{moe_prefix}.shared_expert_gate.weight"
                if gkey in tensors:
                    # qwen2-moe sigmoid gate on the shared expert,
                    # a [1, D] linear kept unquantized (like the router)
                    lp["shared_expert_gate"] = get(gkey).T
            params["layers"].append(lp)
        return params
