"""GPTQ: Hessian-based layer-wise quantization.

Rebuild of reference quantization/gptq/gptq.py (+quant_gptq.py driver):
  * streaming Hessian H = 2/n · Σ XᵀX with sample rescaling
    (gptq.py:75-102)
  * fasterquant: dead-column handling (:148-150), act_order permutation
    by diag(H) (:167-171), percdamp damping (:176-178), Cholesky →
    inverse → upper-Cholesky Hinv (:179-182), blocked column loop with
    error feedback (:184-224), static_groups (:157-165)

TPU-native formulation: the inherently-sequential inner column loop is
a ``lax.fori_loop`` over columns inside a ``lax.scan``-style blocked
sweep — fully on-device, fp32 throughout (SURVEY.md §7 "Hard parts":
no host round-trips). Group scale recomputation at group boundaries is
handled by precomputing per-column (scale, zero) for all columns up
front in the non-static-groups case too — mathematically identical to
the reference's lazy recompute because scales depend only on W columns
within each *original* group, which GPTQ does not modify (error feedback
only touches columns to the right; with act_order groups are formed on
the permuted matrix exactly as the reference does with static_groups
off ... see note below).

NOTE on parity: the reference (act_order off, static_groups off)
recomputes scale/zero from the *current* (already error-compensated) W
at each group boundary (gptq.py:194-204). We reproduce that exactly:
the fori_loop recomputes scales at group boundaries from the live W
block — see ``_find_params_cols`` use inside the loop.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import time

import jax
import jax.numpy as jnp

from .config import GPTQConfig
from .qtensor import QuantizedTensor, pack_rows

__all__ = ["gptq_quantize_weight", "GPTQQuantizer", "accumulate_hessian"]


def accumulate_hessian(
    H: jax.Array, n_prev: jax.Array, x: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Streaming H update (reference gptq.py add_batch:75-102).

    x: [tokens, K] activations of this linear. H' = H·n/(n+t) + 2/(n+t)·XᵀX.
    """
    x = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    t = x.shape[0]
    n_new = n_prev + t
    scale = n_prev / n_new
    x = x * jnp.sqrt(2.0 / n_new)
    return H * scale + x.T @ x, n_new


def _find_params_cols(wcols: jax.Array, bits: int, sym: bool):
    """(scale, zero) [N] for one group's rows wcols [g, N] — the analog
    of the reference quantizer.find_params on a group slice
    (_gptq_quantizer.py:44-72, per out-channel over the group)."""
    maxq = float((1 << bits) - 1)
    if sym:
        mabs = jnp.max(jnp.abs(wcols), axis=0)
        scale = jnp.maximum(2.0 * mabs / maxq, 1e-8)
        zero = jnp.full_like(scale, (maxq + 1) / 2.0)
    else:
        wmin = jnp.minimum(jnp.min(wcols, axis=0), 0.0)
        wmax = jnp.maximum(jnp.max(wcols, axis=0), 0.0)
        scale = jnp.maximum((wmax - wmin) / maxq, 1e-8)
        zero = jnp.round(-wmin / scale)
    return scale, zero


def _find_params_cols_mse(
    wcols: jax.Array,
    bits: int,
    sym: bool,
    maxshrink: float,
    grid: int,
    norm: float,
):
    """MSE grid search over shrink factors p = 1 - i/grid (reference
    _gptq_quantizer.py:74-91): quantize the group at [p·wmin, p·wmax]
    and keep, per out-channel, the (scale, zero) minimizing
    Σ|dq - w|^norm. i=0 gives p=1 (the plain min/max params), so the
    result never loses to ``_find_params_cols``."""
    maxq = float((1 << bits) - 1)
    wmin0 = jnp.minimum(jnp.min(wcols, axis=0), 0.0)
    wmax0 = jnp.maximum(jnp.max(wcols, axis=0), 0.0)
    if sym:
        # reference sym: xmax = max(|min|, |max|), xmin = -xmax
        mabs = jnp.maximum(jnp.abs(wmin0), wmax0)
        wmax0, wmin0 = mabs, -mabs
    n_steps = int(maxshrink * grid)

    def step(i, carry):
        best_err, best_scale, best_zero = carry
        p = 1.0 - i.astype(jnp.float32) / grid
        xmin1, xmax1 = p * wmin0, p * wmax0
        scale1 = jnp.maximum((xmax1 - xmin1) / maxq, 1e-8)
        if sym:
            zero1 = jnp.full_like(scale1, (maxq + 1) / 2.0)
        else:
            zero1 = jnp.round(-xmin1 / scale1)
        q = jnp.clip(jnp.round(wcols / scale1 + zero1), 0.0, maxq)
        dq = (q - zero1) * scale1
        err = jnp.sum(jnp.abs(dq - wcols) ** norm, axis=0)
        better = err < best_err
        return (
            jnp.where(better, err, best_err),
            jnp.where(better, scale1, best_scale),
            jnp.where(better, zero1, best_zero),
        )

    init = (
        jnp.full((wcols.shape[1],), jnp.inf, jnp.float32),
        jnp.ones((wcols.shape[1],), jnp.float32),
        jnp.zeros((wcols.shape[1],), jnp.float32),
    )
    _, scale, zero = jax.lax.fori_loop(0, n_steps, step, init)
    return scale, zero


@partial(
    jax.jit,
    static_argnames=(
        "bits",
        "group_size",
        "actorder",
        "static_groups",
        "sym",
        "mse",
        "mse_maxshrink",
        "mse_grid",
        "mse_norm",
    ),
)
def _gptq_core(
    w: jax.Array,  # [K, N] fp32 — K = in_features ("columns" in GPTQ speak)
    H: jax.Array,  # [K, K] fp32
    bits: int,
    group_size: int,
    percdamp: float,
    actorder: bool,
    static_groups: bool,
    sym: bool,
    mse: bool = False,
    mse_maxshrink: float = 0.8,
    mse_grid: int = 100,
    mse_norm: float = 2.4,
):
    """Returns (Q int [K, N], scales [G, N], zeros [G, N], perm [K], err [N]).

    Operates on W organized [K, N] = [in, out]; GPTQ's sequential loop
    runs over the K axis. (The reference stores W [out, in] and loops
    over its columns — same math, transposed storage.)
    """
    K, N = w.shape
    g = K if group_size == -1 else group_size
    G = K // g
    maxq = float((1 << bits) - 1)
    w = w.astype(jnp.float32)
    H = H.astype(jnp.float32)

    # dead input features (gptq.py:148-150)
    dead = jnp.diag(H) == 0
    H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
    w = jnp.where(dead[:, None], 0.0, w)

    # act_order: sort input features by diag(H) descending (gptq.py:167-171)
    if actorder:
        perm = jnp.argsort(-jnp.diag(H))
        w = w[perm]
        H = H[perm][:, perm]
    else:
        perm = jnp.arange(K)

    # damping (gptq.py:176-178)
    damp = percdamp * jnp.mean(jnp.diag(H))
    H = H + damp * jnp.eye(K)

    # Hinv = upper-Cholesky of H^-1 (gptq.py:179-182)
    L = jax.scipy.linalg.cholesky(H, lower=True)
    Hinv_full = jax.scipy.linalg.cho_solve((L, True), jnp.eye(K))
    Hinv = jax.scipy.linalg.cholesky(Hinv_full, lower=False)  # upper

    # static_groups: precompute scale/zero per group from the ORIGINAL
    # (pre-permutation would be wrong — reference computes them before
    # permuting, gptq.py:157-165, so we do too, then index via perm)
    def find_params(wcols):
        if mse:
            return _find_params_cols_mse(
                wcols, bits, sym, mse_maxshrink, mse_grid, mse_norm
            )
        return _find_params_cols(wcols, bits, sym)

    if static_groups:
        w_orig = w[jnp.argsort(perm)] if actorder else w
        wg = w_orig.reshape(G, g, N)
        sg, zg = jax.lax.map(find_params, wg)
        # per-(permuted)position group index
        gidx_of_pos = perm // g  # group of the original feature at pos i
    else:
        sg = jnp.zeros((G, N))
        zg = jnp.zeros((G, N))
        gidx_of_pos = jnp.arange(K) // g

    def quant_col(col, scale, zero):
        q = jnp.clip(jnp.round(col / scale + zero), 0.0, maxq)
        return q

    # loop carry holds [G, N] group tables + the current group's live
    # (scale, zero) [N] and an online per-column error accumulator —
    # NOT [K, N] scale/zero row maps (at 70B shapes those carried ~13 GB
    # of fp32 through the fori_loop; VERDICT weak #7)
    w0 = w  # post-perm original, for telemetry

    def body(i, carry):
        W, Q, Sg_t, Zg_t, cur_s, cur_z, err_acc = carry
        hinv_ii = Hinv[i, i]
        if static_groups:
            gi = gidx_of_pos[i]
            scale = sg[gi]
            zero = zg[gi]
        else:
            # at a group boundary, (re)compute scale/zero from the LIVE
            # rows [i, i+g) of W (reference gptq.py:194-204)
            is_boundary = (i % g) == 0
            start = (i // g) * g
            grp_rows = jax.lax.dynamic_slice(W, (start, 0), (g, N))
            if mse:
                # the grid search is ~80x a min/max pass — gate it behind
                # the boundary predicate so only K/g iterations pay it
                scale, zero = jax.lax.cond(
                    is_boundary,
                    lambda rows: find_params(rows),
                    lambda rows: (cur_s, cur_z),
                    grp_rows,
                )
            else:
                new_scale, new_zero = _find_params_cols(grp_rows, bits, sym)
                scale = jnp.where(is_boundary, new_scale, cur_s)
                zero = jnp.where(is_boundary, new_zero, cur_z)
            Sg_t = Sg_t.at[i // g].set(scale)
            Zg_t = Zg_t.at[i // g].set(zero)
        wrow = W[i]
        q = quant_col(wrow, scale, zero)
        dq = (q - zero) * scale
        err = (wrow - dq) / hinv_ii
        err_acc = err_acc + (dq - w0[i]) ** 2
        # error feedback to all later rows (gptq.py:206-224) — mask keeps
        # the update strictly below row i
        mask = (jnp.arange(K) > i).astype(jnp.float32)[:, None]
        W = W - (Hinv[i][:, None] * err[None, :]) * mask
        Q = Q.at[i].set(q)
        return W, Q, Sg_t, Zg_t, scale, zero, err_acc

    Q0 = jnp.zeros((K, N))
    Sg0 = sg if static_groups else jnp.zeros((G, N))
    Zg0 = zg if static_groups else jnp.zeros((G, N))
    _, Q, scales_g, zeros_g, _, _, err = jax.lax.fori_loop(
        0,
        K,
        body,
        (w, Q0, Sg0, Zg0, jnp.ones((N,)), jnp.zeros((N,)), jnp.zeros((N,))),
    )
    if static_groups and actorder:
        # groups follow ORIGINAL feature ids; keep the original tables
        # (caller canonicalizes via the composed permutation)
        scales_g, zeros_g = sg, zg
    return Q.astype(jnp.int32), scales_g, zeros_g, perm, err, gidx_of_pos


def gptq_quantize_weight(
    w: jax.Array,
    H: jax.Array,
    bits: int = 4,
    group_size: int = 128,
    config: Optional[GPTQConfig] = None,
    scale_dtype=jnp.float16,
) -> Tuple[QuantizedTensor, jax.Array]:
    """Quantize one weight [K, N] given its Hessian [K, K].

    Returns (QuantizedTensor, per-column squared error telemetry).

    act_order note: with act_order and NOT static_groups, groups are
    formed over the PERMUTED feature order (contiguous blocks of the
    sorted features — matches reference behavior where groups are
    [i, i+g) of the permuted matrix). The permutation is stored in
    ``perm`` and applied to activations at matmul time. With
    static_groups+act_order the reference keeps original-order groups;
    we canonicalize by re-sorting features so groups stay contiguous:
    perm is composed accordingly.
    """
    cfg = config or GPTQConfig(wbits=bits, groupsize=group_size)
    mse_kw = dict(
        mse=cfg.mse,
        mse_maxshrink=cfg.mse_maxshrink,
        mse_grid=cfg.mse_grid,
        mse_norm=cfg.mse_norm,
    )
    if cfg.static_groups and cfg.act_order:
        # canonical layout needs group-contiguous rows: stable-sort the
        # act_order permutation within each original group id
        Q, sg, zg, perm, err, gidx = _gptq_core(
            w, H, bits, group_size, cfg.percdamp, True, True, cfg.sym, **mse_kw
        )
        order = jnp.argsort(gidx, stable=True)  # group-major, act-sorted inside
        Q = Q[order]
        perm = perm[order]
        scales, zeros = sg, zg
    else:
        Q, scales, zeros, perm, err, _ = _gptq_core(
            w,
            H,
            bits,
            group_size,
            cfg.percdamp,
            cfg.act_order,
            cfg.static_groups,
            cfg.sym,
            **mse_kw,
        )
    scales = scales.astype(scale_dtype)
    zeros = zeros.astype(scale_dtype)
    K, N = w.shape
    qt = QuantizedTensor(
        qweight=pack_rows(Q, bits),
        scales=scales,
        zeros=zeros,
        perm=perm.astype(jnp.int32) if cfg.act_order else None,
        bits=bits,
        group_size=group_size,
        in_features=K,
        out_features=N,
        sym=cfg.sym,
    )
    return qt, err


def gen_conditions(wbits: int, groupsize: int, n: int = 6):
    """Mixed-bit promotion ladder (reference utils/modelutils.py:26-41):
    halve the groupsize down to 32, then bump bits and reset."""
    conds = []
    b, g = wbits, groupsize
    for _ in range(n):
        if g > 32:
            g = g // 2
        else:
            b, g = b + 1, groupsize
        if b > 8:
            break
        conds.append((b, g))
    return conds


# true-sequential subsets for the llama family
# (reference sequential_layes_gptq_config.py:58-63)
_TRUE_SEQUENTIAL = [
    ["q_proj", "k_proj", "v_proj"],
    ["o_proj"],
    ["gate_proj", "up_proj"],
    ["down_proj"],
]

# deepseek-v2 MLA: the q branch and kv_a share the block input; kv_b
# reads the normed latent — its Hessian must see the (already
# quantized) kv_a output, so it gets its own subset
_TRUE_SEQUENTIAL_MLA = [
    ["q_proj", "q_a_proj", "kv_a_proj_with_mqa"],
    ["q_b_proj", "kv_b_proj"],
    ["o_proj"],
    ["gate_proj", "up_proj"],
    ["down_proj"],
]


def true_sequential_subsets(model_cfg) -> List[List[str]]:
    """Per-architecture true_sequential grouping (the role of the
    reference's sequential_layes_gptq_config.py tables — here derived
    from the block shape instead of 19 hand tables)."""
    if getattr(model_cfg, "attn_type", "mha") == "mla":
        return [list(s) for s in _TRUE_SEQUENTIAL_MLA]
    return [list(s) for s in _TRUE_SEQUENTIAL]


class GPTQQuantizer:
    """Model-level GPTQ driver (reference quant_gptq.py): per block —
    collect Hessians from calibration activations, quantize each linear
    (optionally subset-by-subset so later subsets see quantized
    activations: true_sequential, quant_gptq.py:103-111), re-forward the
    quantized block to propagate activations. ``allow_mix_bits`` climbs
    the (bits, groupsize) ladder on high-error layers until the error
    halves (ObserverHelper.post_quant, quant_gptq.py:23-64 — applied
    inline per layer while its Hessian is live, capped at 32 promotions
    like the reference's top-32 set)."""

    MAX_PROMOTIONS = 32

    def __init__(self, config: GPTQConfig):
        self.config = config
        self.observer: List[tuple] = []
        self.quant_config_by_layer: Dict[str, Dict[str, int]] = {}

    def _quantize_one(self, w, H, bits, gs, full_name, promotions_left, x=None):
        cfg = self.config
        qt, err = gptq_quantize_weight(w, H, bits, gs, cfg)
        err0 = float(jnp.sum(err))
        used = (bits, gs)
        if cfg.allow_mix_bits and promotions_left > 0:
            for b2, g2 in gen_conditions(bits, gs):
                if err0 <= 0 or used != (bits, gs):
                    break
                qt2, err2 = gptq_quantize_weight(
                    w, H, b2, g2, dataclasses.replace(cfg, wbits=b2, groupsize=g2)
                )
                if float(jnp.sum(err2)) < 0.5 * err0:
                    qt, used = qt2, (b2, g2)
        snr_db = None
        if x is not None:
            # per-layer output SNR on a calibration sample — the
            # reference's print_loss fp-input column (gptq.py:104-127,
            # modelutils.py torch_snr_error :71-118)
            from ..quant.qtensor import dequantize_tensor, unpermute_dense
            from ..utils.metrics import snr_error

            x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
            wq = dequantize_tensor(qt).astype(jnp.float32)
            if qt.perm is not None:
                wq = unpermute_dense(qt, wq)
            snr_db = snr_error(x2 @ w, x2 @ wq)
        self.observer.append((full_name, err0, used, snr_db))
        self.quant_config_by_layer[full_name] = {
            "wbits": used[0],
            "groupsize": used[1],
        }
        return qt, used != (bits, gs)

    def quantize(
        self,
        params: Dict[str, Any],
        model_cfg,
        calib_tokens: jax.Array,  # [nsamples, seqlen] int32
        layer_overrides: Optional[Dict[str, Any]] = None,
        progress: bool = True,
        cache_dir: Optional[str] = None,
    ) -> Dict[str, Any]:
        from .frame import (
            embed_inputs,
            load_layer_cache,
            resolve_layer_bits,
            run_block,
            save_layer_cache,
        )
        from .hessian import collect_block_hessians
        from ..models.llama import ALL_LINEAR_NAMES

        cfg = self.config
        h, cos, sin, mask = embed_inputs(params, model_cfg, calib_tokens)
        new_layers: List[Dict[str, Any]] = []
        promotions = 0
        subsets = (
            true_sequential_subsets(model_cfg)
            if cfg.true_sequential
            else [list(ALL_LINEAR_NAMES)]
        )
        for i, lp in enumerate(params["layers"]):
            t_layer = time.time()
            cached = load_layer_cache(cache_dir, i)
            if cached is not None:
                h = run_block(cached, model_cfg, h, cos, sin, mask)
                new_layers.append(cached)
                if progress:
                    print(f"[gptq] layer {i + 1} from cache", flush=True)
                continue
            nlp = dict(lp)
            for subset in subsets:
                # Hessians reflect any already-quantized earlier subsets
                Hs = collect_block_hessians(nlp, model_cfg, h, cos, sin, mask)
                # one-sample activations for the SNR report column
                from ..models.llama import layer_intermediates

                acts = layer_intermediates(
                    nlp, model_cfg, h[:1], cos[:1], sin[:1], mask[:1]
                )
                for name in subset:
                    if name not in lp:
                        continue
                    full = f"model.layers.{i}.{name}"
                    b, gs = resolve_layer_bits(
                        full, cfg.wbits, cfg.groupsize, layer_overrides
                    )
                    if b >= 16:
                        continue
                    qt, promoted = self._quantize_one(
                        lp[name].astype(jnp.float32),
                        Hs[name],
                        b,
                        gs,
                        full,
                        self.MAX_PROMOTIONS - promotions,
                        x=acts.get(name),
                    )
                    promotions += int(promoted)
                    nlp[name] = qt
            if "experts" in lp:
                # MoE: router-weighted Hessians per expert (collected
                # after the attention projections are quantized)
                Hs = collect_block_hessians(nlp, model_cfg, h, cos, sin, mask)
                nexp = []
                for e, ep in enumerate(lp["experts"]):
                    nep = dict(ep)
                    for name in ("gate_proj", "up_proj", "down_proj"):
                        full = f"model.layers.{i}.experts.{e}.{name}"
                        b, gs = resolve_layer_bits(
                            full, cfg.wbits, cfg.groupsize, layer_overrides
                        )
                        if b >= 16:
                            continue
                        qt, promoted = self._quantize_one(
                            ep[name].astype(jnp.float32),
                            Hs[f"experts.{e}.{name}"],
                            b,
                            gs,
                            full,
                            self.MAX_PROMOTIONS - promotions,
                        )
                        promotions += int(promoted)
                        nep[name] = qt
                    nexp.append(nep)
                nlp["experts"] = nexp
                if "shared_experts" in lp:
                    # deepseek shared experts: quantized with the same
                    # post-LN input Hessian (weight 1 — always routed)
                    nse = dict(lp["shared_experts"])
                    for name in ("gate_proj", "up_proj", "down_proj"):
                        full = f"model.layers.{i}.shared_experts.{name}"
                        b, gs = resolve_layer_bits(
                            full, cfg.wbits, cfg.groupsize, layer_overrides
                        )
                        if b >= 16:
                            continue
                        qt, promoted = self._quantize_one(
                            nse[name].astype(jnp.float32),
                            Hs[f"shared_experts.{name}"],
                            b,
                            gs,
                            full,
                            self.MAX_PROMOTIONS - promotions,
                        )
                        promotions += int(promoted)
                        nse[name] = qt
                    nlp["shared_experts"] = nse
            save_layer_cache(cache_dir, i, nlp)
            # propagate QUANTIZED activations to the next block
            # (reference quant_gptq.py:146-154)
            h = run_block(nlp, model_cfg, h, cos, sin, mask)
            new_layers.append(nlp)
            if progress:
                print(
                    f"[gptq] layer {i + 1}/{len(params['layers'])} "
                    f"({time.time() - t_layer:.1f}s)",
                    flush=True,
                )
        if progress and self.observer:
            from ..utils.metrics import quant_report

            print(quant_report(self.observer), flush=True)
        out = dict(params)
        out["layers"] = new_layers
        return out
