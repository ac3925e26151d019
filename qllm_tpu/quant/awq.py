"""AWQ: activation-aware weight quantization.

Rebuild of reference quantization/awq/_awq_quantizer.py:
  * per-channel scale grid search: 20 ratios of
    s = x_absmean^r / w_groupnorm^(1-r), normalized, minimizing the
    scale-group's output MSE after pseudo-quantization
    (_search_module_scale :292-361)
  * scale folding into the previous op (LN -> fcs, fc -> fc,
    apply_scale :30-76)
  * auto-clip: per-(out-channel, group) weight-max grid search (20 grid,
    0.5 max shrink, sampled tokens) minimizing ||Wx - Q(clip(W))x||,
    skipped for q/k projections (auto_clip_layer :182-232, :246)
  * AWQ caps calibration at 64 samples (auto_model_quantization.py:211)

Functional formulation: scale groups are (prev_op, [linears], out_fn)
tuples over the params dict; "inspect module" outputs are computed by
pure sub-functions of the block. Weight updates are pytree replaces.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import os
import time

import jax
import jax.numpy as jnp

from .config import AWQConfig
from .qtensor import QuantizedTensor, quantize_tensor

__all__ = ["AWQQuantizer", "awq_search_scale", "awq_auto_clip"]

N_GRID = 20  # reference: 20 ratio candidates / 20 clip candidates
CLIP_MAX_SHRINK = 0.5
CLIP_N_SAMPLE_TOKENS = 512


def _pseudo_quantize(w: jax.Array, bits: int, group_size: int) -> jax.Array:
    """Asym group quant-dequant (reference pseudo_quantize_tensor
    :143-177) along the input (K) axis of w [K, N]."""
    K, N = w.shape
    g = K if group_size == -1 else group_size
    maxq = (1 << bits) - 1
    wg = w.reshape(K // g, g, N)
    wmin = jnp.min(wg, axis=1, keepdims=True)
    wmax = jnp.max(wg, axis=1, keepdims=True)
    scale = jnp.maximum((wmax - wmin) / maxq, 1e-8)
    zero = jnp.round(-wmin / scale)
    q = jnp.clip(jnp.round(wg / scale) + zero, 0, maxq)
    return ((q - zero) * scale).reshape(K, N)


def _default_out_fn(x, ws, extra):
    x2 = x.reshape(-1, x.shape[-1])
    return jnp.concatenate([x2 @ w for w in ws], axis=-1)


@partial(jax.jit, static_argnames=("bits", "group_size", "out_fn"))
def awq_search_scale(
    x: jax.Array,  # [..., K] inputs to the scale group
    weights: Tuple[jax.Array, ...],  # each [K, N_i]
    bits: int,
    group_size: int,
    out_fn: Optional[Callable] = None,  # (x, ws, extra) -> module output
    extra: Tuple[jax.Array, ...] = (),
) -> jax.Array:
    """Best per-in-channel scales [K] over the ratio grid.

    ``out_fn(x, ws, extra)`` is the search objective — the ENCLOSING
    MODULE's output, matching the reference's module2inspect MSE
    (_awq_quantizer.py _search_module_scale :292-361). The default is
    the concatenated linear outputs (exact for single-linear groups;
    the driver passes attention-block / MLP-block objectives for the
    qkv and gate/up groups). ``out_fn`` must be a module-level function
    or cached partial (it is a static jit arg); array context goes
    through ``extra`` (traced)."""
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    x = x.astype(jnp.float32)
    x_max = jnp.mean(jnp.abs(xf), axis=0)  # get_act_scale

    def w_group_norm(w):
        K = w.shape[0]
        g = K if group_size == -1 else group_size
        a = jnp.abs(w.reshape(K // g, g, -1))
        a = a / jnp.maximum(jnp.max(a, axis=1, keepdims=True), 1e-12)
        return jnp.mean(a.reshape(K, -1), axis=1)

    w_max = jnp.mean(jnp.stack([w_group_norm(w) for w in weights]), axis=0)

    if out_fn is None:
        out_fn = _default_out_fn

    org_out = out_fn(x, [w.astype(jnp.float32) for w in weights], extra)

    def try_ratio(ratio):
        s = jnp.clip(
            jnp.power(x_max, ratio) / jnp.power(w_max, 1.0 - ratio),
            1e-4,
            1e4,
        )
        s = s / jnp.sqrt(jnp.max(s) * jnp.min(s))
        ws_q = [
            _pseudo_quantize(w * s[:, None], bits, group_size) for w in weights
        ]
        out = out_fn(x / s, ws_q, extra)
        return jnp.mean((org_out - out) ** 2), s

    ratios = jnp.arange(N_GRID, dtype=jnp.float32) / N_GRID
    losses, scales = jax.lax.map(try_ratio, ratios)
    best = jnp.argmin(losses)
    return scales[best]


@partial(jax.jit, static_argnames=("bits", "group_size"))
def awq_auto_clip(
    x: jax.Array,  # [T, K]
    w: jax.Array,  # [K, N]
    bits: int,
    group_size: int,
) -> jax.Array:
    """Per-(group, out-channel) clipped max values; returns clipped w.

    Reference auto_clip_layer :182-232: minimize ||w·x - Q(clip(w))·x||²
    over 20 shrink factors, per input-group, using sampled tokens.
    """
    K, N = w.shape
    g = K if group_size == -1 else group_size
    T = x.reshape(-1, K).shape[0]
    step = max(1, T // CLIP_N_SAMPLE_TOKENS)
    xs = x.reshape(-1, K)[::step].astype(jnp.float32)  # [t, K]
    w = w.astype(jnp.float32)
    wg = w.reshape(K // g, g, N)
    xg = xs.reshape(-1, K // g, g).transpose(1, 0, 2)  # [G, t, g]
    org_max = jnp.max(jnp.abs(wg), axis=1, keepdims=True)  # [G, 1, N]
    org_out = jnp.einsum("gtk,gkn->gtn", xg, wg)  # [G, t, N]

    def try_shrink(i):
        alpha = 1.0 - i / N_GRID * CLIP_MAX_SHRINK
        cmax = org_max * alpha
        wc = jnp.clip(wg, -cmax, cmax)
        # pseudo-quant within the clipped range (per group, asym)
        maxq = (1 << bits) - 1
        wmin = jnp.minimum(jnp.min(wc, axis=1, keepdims=True), 0.0)
        wmax = jnp.maximum(jnp.max(wc, axis=1, keepdims=True), 0.0)
        scale = jnp.maximum((wmax - wmin) / maxq, 1e-8)
        zero = jnp.round(-wmin / scale)
        q = jnp.clip(jnp.round(wc / scale) + zero, 0, maxq)
        wq = (q - zero) * scale
        out = jnp.einsum("gtk,gkn->gtn", xg, wq)
        err = jnp.mean((out - org_out) ** 2, axis=1)  # [G, N]
        return err, cmax[:, 0, :]

    errs, cmaxs = jax.lax.map(
        try_shrink, jnp.arange(N_GRID, dtype=jnp.float32)
    )
    best = jnp.argmin(errs, axis=0)  # [G, N]
    best_max = jnp.take_along_axis(cmaxs, best[None], axis=0)[0]  # [G, N]
    wc = jnp.clip(wg, -best_max[:, None, :], best_max[:, None, :])
    return wc.reshape(K, N)


# ---------------------------------------------------------------------------
# Block-level search objectives (the reference minimizes the ENCLOSING
# module's output MSE — module2inspect, _awq_quantizer.py:292-361 — not
# the raw linear outputs). These are module-level functions (static jit
# args); per-config partials are cached so jit sees a stable identity.
# ---------------------------------------------------------------------------

_OBJ_CACHE: Dict[tuple, Callable] = {}


def _cached_partial(fn, **kw):
    key = (fn,) + tuple(sorted(kw.items()))
    if key not in _OBJ_CACHE:
        _OBJ_CACHE[key] = partial(fn, **kw)
    return _OBJ_CACHE[key]


def _mlp_block_out(x, ws, extra, act: str):
    """Gated-MLP output: down(act(x@gate) * (x@up)). ws=(gate, up),
    extra=(down_fp,)."""
    from ..models.llama import act_fn

    x2 = x.reshape(-1, x.shape[-1])
    return (act_fn(act, x2 @ ws[0]) * (x2 @ ws[1])) @ extra[0]


def _attn_block_out(
    x, ws, extra, n_heads: int, n_kv: int, hd: int, rope_style: str,
    rot_dim: int, n_rep: int, has_rope: bool,
):
    """Attention-block output incl. o_proj. ws=(wq, wk, wv),
    extra=(cos, sin, mask, wo_fp). x is [B, T, D]."""
    from ..models.llama import _attention, apply_rope

    B, T, D = x.shape
    cos, sin, mask, wo = extra
    q = (x.reshape(-1, D) @ ws[0]).reshape(B, T, n_heads, hd)
    k = (x.reshape(-1, D) @ ws[1]).reshape(B, T, n_kv, hd)
    v = (x.reshape(-1, D) @ ws[2]).reshape(B, T, n_kv, hd)
    if has_rope:
        q, k = apply_rope(q, k, cos, sin, rope_style, rot_dim)
    attn = _attention(q, k, v, mask, n_rep).reshape(B * T, n_heads * hd)
    return attn @ wo


# archs where the nonlinear fc1->fc2 gap is bridged by a stored
# activation divider — the reference's ScaledActivation insertion list
# (_act_scales_map, sequential_layes_awq_config.py:1222-1231)
_ACT_SCALE_ARCHS = {
    "bloom",
    "falcon",
    "gpt_neox",
    "gptj",
    "gpt_bigcode",
    "mpt",
    "starcoder2",
}


def _moe_groups(lp) -> list:
    """post-LN -> every (routed + shared) expert gate/up, plus per-expert
    up->down folds (the reference's mixtral/deepseek-v2 tables)."""
    E = len(lp["experts"])
    fan_in = [
        f"experts.{e}.{n}" for e in range(E) for n in ("gate_proj", "up_proj")
    ]
    groups = []
    if "shared_experts" in lp:
        fan_in += ["shared_experts.gate_proj", "shared_experts.up_proj"]
        groups.append(
            ("fc", "shared_experts.up_proj", ["shared_experts.down_proj"])
        )
    groups.insert(0, ("ln", "post_attention_layernorm", fan_in))
    for e in range(E):
        groups.append(
            ("fc", f"experts.{e}.up_proj", [f"experts.{e}.down_proj"])
        )
    return groups


def _layer_groups(lp, model_cfg=None) -> list:
    """Scale groups for one layer, derived from the architecture shape
    (the role of the reference's 24 per-arch get_*_layers functions,
    sequential_layes_awq_config.py):

      * input norm -> q/k/v (+ fc_in when the parallel block shares ONE
        norm: gptj/falcon-7b/phi, reference get_gptj_layers)
      * v -> o when shapes match (no GQA)
      * post-attention norm -> gate/up (gated) or fc1 (plain)
      * up -> down for gated MLPs (linear fold through the elementwise
        product); plain MLPs on _ACT_SCALE_ARCHS get a stored activation
        divider instead (ScaledActivation, _awq_quantizer.py:79-124)

    MoE layers route the post-LN group into every expert's gate/up and
    add per-expert up->down groups (the reference's mixtral table).

    MLA (deepseek-v2, reference get_deepseek_v2_layers): input norm ->
    (q branch entry + kv_a); the low-rank norms q_a_layernorm /
    kv_a_layernorm fold into q_b / kv_b. No v->o fold (v is an interior
    slice of kv_b's per-head output)."""
    if "kv_a_proj_with_mqa" in lp:  # MLA
        first = [n for n in ("q_proj", "q_a_proj") if n in lp]
        first.append("kv_a_proj_with_mqa")
        groups = [("ln", "input_layernorm", first)]
        if "q_b_proj" in lp:
            groups.append(("ln", "q_a_layernorm", ["q_b_proj"]))
        groups.append(("ln", "kv_a_layernorm", ["kv_b_proj"]))
        if "experts" in lp:
            groups += _moe_groups(lp)
        else:
            groups.append(
                ("ln", "post_attention_layernorm", ["gate_proj", "up_proj"])
            )
            groups.append(("fc", "up_proj", ["down_proj"]))
        return groups
    shared = model_cfg is not None and model_cfg.shared_input_norm
    gated = "gate_proj" in lp or "experts" in lp
    qkv = [n for n in ("q_proj", "k_proj", "v_proj") if n in lp]
    # a shared input norm feeds the MLP too (gptj/falcon-7b/phi plain
    # fc_in; cohere's parallel block is GATED — both gate and up)
    shared_mlp = (["gate_proj", "up_proj"] if gated else ["up_proj"]) if shared else []
    groups = [
        ("ln", "input_layernorm", qkv + shared_mlp),
        ("fc", "v_proj", ["o_proj"]),
    ]
    if "experts" in lp:
        return groups + _moe_groups(lp)
    if not shared:
        mlp_in = ["gate_proj", "up_proj"] if gated else ["up_proj"]
        groups.append(("ln", "post_attention_layernorm", mlp_in))
    if gated:
        groups.append(("fc", "up_proj", ["down_proj"]))
    elif model_cfg is not None and model_cfg.arch in _ACT_SCALE_ARCHS:
        groups.append(("act", None, ["down_proj"]))
    return groups


def _getw(lp, name):
    if name.startswith("shared_experts."):
        return lp["shared_experts"][name.split(".", 1)[1]]
    if name.startswith("experts."):
        _, e, n = name.split(".")
        return lp["experts"][int(e)][n]
    return lp[name]


def _setw(lp, name, w):
    if name.startswith("shared_experts."):
        lp["shared_experts"][name.split(".", 1)[1]] = w
    elif name.startswith("experts."):
        _, e, n = name.split(".")
        lp["experts"][int(e)][n] = w
    else:
        lp[name] = w


class AWQQuantizer:
    """Model-level AWQ driver (reference quant_awq.py)."""

    def __init__(self, config: AWQConfig):
        self.config = config

    def quantize(
        self,
        params: Dict[str, Any],
        model_cfg,
        calib_tokens: jax.Array,
        layer_overrides: Optional[Dict[str, Any]] = None,
        progress: bool = True,
        cache_dir: Optional[str] = None,
    ) -> Dict[str, Any]:
        from ..models.llama import ALL_LINEAR_NAMES, layer_intermediates
        from .frame import (
            embed_inputs,
            load_layer_cache,
            resolve_layer_bits,
            run_block,
            save_layer_cache,
        )

        cfg = self.config
        calib_tokens = calib_tokens[: min(cfg.nsamples, calib_tokens.shape[0])]
        h, cos, sin, mask = embed_inputs(params, model_cfg, calib_tokens)
        new_layers: List[Dict[str, Any]] = []
        for i, lp in enumerate(params["layers"]):
            t_layer = time.time()
            cached = load_layer_cache(cache_dir, i)
            if cached is not None:
                h = run_block(cached, model_cfg, h, cos, sin, mask)
                new_layers.append(cached)
                if progress:
                    print(f"[awq] layer {i + 1} from cache", flush=True)
                continue
            acts = layer_intermediates(lp, model_cfg, h, cos, sin, mask)
            nlp = dict(lp)
            if "experts" in lp:
                nlp["experts"] = [dict(ep) for ep in lp["experts"]]
            if "shared_experts" in lp:
                nlp["shared_experts"] = dict(lp["shared_experts"])
            # --- scale search + fold, group by group ---
            for kind, prev, linears in _layer_groups(lp, model_cfg):
                if kind == "fc" and prev == "v_proj" and (
                    "v_proj" not in nlp
                    or nlp["v_proj"].shape != nlp["o_proj"].shape
                ):
                    continue  # GQA: v/o shapes differ (reference llama table)
                xk = (
                    "experts_input"
                    if prev == "post_attention_layernorm"
                    and any(n.split(".")[0] == "experts" for n in linears)
                    else linears[0]
                )
                x = acts[xk].reshape(-1, acts[xk].shape[-1])
                ws = tuple(_getw(nlp, n).astype(jnp.float32) for n in linears)
                # block-level objective (reference module2inspect MSE):
                # attention output for the qkv group, full MLP output
                # for the gate/up group — on a small sample subset to
                # bound the 20-ratio grid's activation memory. Disable
                # with QLLM_TPU_AWQ_BLOCK_OBJ=0 (falls back to the
                # concatenated-linear objective).
                out_fn = None
                extra = ()
                ns = max(1, min(2, acts[xk].shape[0]))
                if os.environ.get("QLLM_TPU_AWQ_BLOCK_OBJ", "1") != "0":
                    if (
                        prev == "input_layernorm"
                        and list(linears[:3]) == ["q_proj", "k_proj", "v_proj"]
                        and len(linears) == 3
                        and "o_proj" in nlp
                        and not isinstance(nlp["o_proj"], QuantizedTensor)
                        and cos is not None
                    ):
                        hd = model_cfg.hd
                        out_fn = _cached_partial(
                            _attn_block_out,
                            n_heads=model_cfg.num_attention_heads,
                            n_kv=model_cfg.num_key_value_heads,
                            hd=hd,
                            rope_style=model_cfg.rope_style,
                            rot_dim=model_cfg.rotary_dim,
                            n_rep=model_cfg.n_rep,
                            has_rope=model_cfg.pos_embedding == "rope",
                        )
                        x = acts[xk][:ns]
                        extra = (
                            cos[:ns],
                            sin[:ns],
                            mask[:ns],
                            nlp["o_proj"].astype(jnp.float32),
                        )
                    elif (
                        prev == "post_attention_layernorm"
                        and list(linears) == ["gate_proj", "up_proj"]
                        and "down_proj" in nlp
                        and not isinstance(nlp["down_proj"], QuantizedTensor)
                    ):
                        out_fn = _cached_partial(
                            _mlp_block_out, act=model_cfg.hidden_act
                        )
                        x = acts[xk][:ns].reshape(-1, acts[xk].shape[-1])
                        extra = (nlp["down_proj"].astype(jnp.float32),)
                s = awq_search_scale(
                    x, ws, cfg.wbits, cfg.groupsize, out_fn=out_fn, extra=extra
                )
                # the captured input features now see the folded scale
                # (reference apply_scale input_feat_dict div_ :74-76)
                for n in linears:
                    acts[n] = acts[n] / s
                if xk == "experts_input":
                    acts[xk] = acts[xk] / s
                for n in linears:
                    _setw(
                        nlp,
                        n,
                        (_getw(nlp, n).astype(jnp.float32) * s[:, None]).astype(
                            _getw(nlp, n).dtype
                        ),
                    )
                if kind == "act":
                    # nonlinear fc1->fc2 gap: store the divider (the
                    # reference's ScaledActivation, _awq_quantizer.py:
                    # 79-124); weights were already multiplied above
                    nlp[f"{linears[0]}_act_scale"] = s
                elif kind == "ln":
                    nlp[prev] = (nlp[prev].astype(jnp.float32) / s).astype(
                        nlp[prev].dtype
                    )
                    bias_name = f"{prev}_bias"
                    if bias_name in nlp:  # layernorm archs scale bias too
                        nlp[bias_name] = (
                            nlp[bias_name].astype(jnp.float32) / s
                        ).astype(nlp[bias_name].dtype)
                    if "experts" in lp and prev == "post_attention_layernorm":
                        # router reads the SAME rescaled LN output
                        nlp["router"] = (
                            nlp["router"].astype(jnp.float32) * s[:, None]
                        ).astype(nlp["router"].dtype)
                        # qwen2_moe's sigmoid shared_expert_gate also
                        # reads the LN output directly — compensate it
                        # the same way ([D, 1] transposed layout)
                        if nlp.get("shared_expert_gate") is not None:
                            nlp["shared_expert_gate"] = (
                                nlp["shared_expert_gate"].astype(jnp.float32)
                                * s[:, None]
                            ).astype(nlp["shared_expert_gate"].dtype)
                else:  # fc: divide prev's OUT channels
                    _setw(
                        nlp,
                        prev,
                        (
                            _getw(nlp, prev).astype(jnp.float32) / s[None, :]
                        ).astype(_getw(nlp, prev).dtype),
                    )
                # fold into bias of prev fc too, if present
                bias_name = f"{prev}_bias"
                if kind == "fc" and bias_name in nlp:
                    nlp[bias_name] = (
                        nlp[bias_name].astype(jnp.float32) / s
                    ).astype(nlp[bias_name].dtype)
            # --- auto clip (skip q/k: reference :246) + final quantize ---
            quant_names = [n for n in ALL_LINEAR_NAMES if n in nlp]
            if "experts" in lp:
                quant_names += [
                    f"experts.{e}.{n}"
                    for e in range(len(lp["experts"]))
                    for n in ("gate_proj", "up_proj", "down_proj")
                ]
            if "shared_experts" in lp:
                quant_names += [
                    f"shared_experts.{n}"
                    for n in ("gate_proj", "up_proj", "down_proj")
                ]
            for name in quant_names:
                full = f"model.layers.{i}.{name}"
                b, gs = resolve_layer_bits(
                    full, cfg.wbits, cfg.groupsize, layer_overrides
                )
                if b >= 16:
                    continue
                w = _getw(nlp, name).astype(jnp.float32)
                # reference auto_clip skips query/key-side projections
                # (substring match on q_/k_, _awq_quantizer.py:246)
                if name not in ("q_proj", "k_proj", "q_a_proj", "q_b_proj"):
                    xa = acts[
                        name
                        if name in acts
                        else "experts_input"
                    ]
                    w = awq_auto_clip(
                        xa.reshape(-1, xa.shape[-1]), w, b, gs
                    )
                _setw(nlp, name, quantize_tensor(w, bits=b, group_size=gs))
            save_layer_cache(cache_dir, i, nlp)
            h = run_block(nlp, model_cfg, h, cos, sin, mask)
            new_layers.append(nlp)
            if progress:
                print(
                    f"[awq] layer {i + 1}/{len(params['layers'])} "
                    f"({time.time() - t_layer:.1f}s)",
                    flush=True,
                )
        out = dict(params)
        out["layers"] = new_layers
        return out
