"""HQQ: data-free half-quadratic quantization.

Rebuild of reference quantization/hqq/_hqq_quantizer.py: per-group
min/max affine init, then a proximal solver alternating rounding and
lp-norm (p=0.7) shrinkage on the residual, optimizing the zero-point
only (optimize_weights_proximal, :28-64: beta *= kappa each iter, early
stop when mean error rises). Data-free — the reference forces the
dataloader empty (quant_hqq.py:18).

TPU-native formulation: the whole solver is a fixed-bound
``lax.fori_loop`` over vectorized group tensors — one fused XLA loop
per weight, no host round-trips; early stopping is a carried flag that
freezes updates (matching the reference's break-on-rise semantics).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .config import HQQConfig
from .qtensor import QuantizedTensor, pack_rows

__all__ = ["hqq_quantize_weight", "HQQQuantizer"]


@partial(jax.jit, static_argnames=("bits", "group_size", "iters"))
def _hqq_solve(
    w: jax.Array,
    bits: int,
    group_size: int,
    iters: int = 20,
    lp_norm: float = 0.7,
    beta0: float = 10.0,
    kappa: float = 1.01,
):
    """Returns (scales [G,N] — OUR convention w=(q-z)*s —, zeros [G,N])."""
    K, N = w.shape
    g = K if group_size == -1 else group_size
    G = K // g
    maxq = float((1 << bits) - 1)
    wg = w.astype(jnp.float32).reshape(G, g, N)

    # --- init (reference _hqq_quantizer.py quantize(): scale = maxq/range,
    # zero = -min*scale, round_zero) ---
    wmin = jnp.min(wg, axis=1, keepdims=True)
    wmax = jnp.max(wg, axis=1, keepdims=True)
    denom = jnp.maximum(wmax - wmin, 1e-8)
    scale = jnp.minimum(maxq / denom, 2e4)  # HQQ convention: q = w*scale + zero
    zero = jnp.round(-wmin * scale)

    def shrink(x, beta):
        # lp-norm (p<1) proximal shrinkage (reference shrink_lp_op)
        return jnp.sign(x) * jnp.maximum(
            jnp.abs(x) - (1.0 / beta) * jnp.abs(x) ** (lp_norm - 1), 0.0
        )

    def err_of(zero):
        wq = jnp.clip(jnp.round(wg * scale + zero), 0, maxq)
        return jnp.mean(jnp.abs(wg - (wq - zero) / scale))

    def body(i, carry):
        zero, beta, best_zero, best_err, stopped = carry
        wq = jnp.clip(jnp.round(wg * scale + zero), 0, maxq)
        wr = (wq - zero) / scale
        we = shrink(wg - wr, beta)
        new_zero = jnp.mean(wq - (wg - we) * scale, axis=1, keepdims=True)
        cur = err_of(new_zero)
        improved = cur < best_err
        take = jnp.logical_and(improved, jnp.logical_not(stopped))
        best_zero = jnp.where(take, new_zero, best_zero)
        best_err = jnp.where(take, cur, best_err)
        stopped = jnp.logical_or(stopped, jnp.logical_not(improved))
        zero = jnp.where(stopped, zero, new_zero)
        return zero, beta * kappa, best_zero, best_err, stopped

    init_err = err_of(zero)
    carry = (zero, jnp.float32(beta0), zero, init_err, jnp.array(False))
    _, _, best_zero, _, _ = jax.lax.fori_loop(0, iters, body, carry)

    # convert to canonical convention: w = (q - z) * s
    scales_out = (1.0 / scale)[:, 0, :]
    zeros_out = best_zero[:, 0, :]
    return scales_out, zeros_out


def hqq_quantize_weight(
    w: jax.Array,
    bits: int = 4,
    group_size: int = 64,
    config: Optional[HQQConfig] = None,
    scale_dtype=jnp.float16,
) -> QuantizedTensor:
    cfg = config or HQQConfig(wbits=bits, groupsize=group_size)
    K, N = w.shape
    g = K if group_size == -1 else group_size
    scales, zeros = _hqq_solve(
        w,
        bits,
        group_size,
        iters=cfg.iters,
        lp_norm=cfg.lp_norm,
        beta0=cfg.beta,
        kappa=cfg.kappa,
    )
    # storage-dtype roundtrip, then quantize on the stored grid
    scales = scales.astype(scale_dtype).astype(jnp.float32)
    zeros = zeros.astype(scale_dtype).astype(jnp.float32)
    maxq = (1 << bits) - 1
    wg = w.astype(jnp.float32).reshape(K // g, g, N)
    q = jnp.clip(
        jnp.round(wg / scales[:, None, :] + zeros[:, None, :]), 0, maxq
    )
    return QuantizedTensor(
        qweight=pack_rows(q.reshape(K, N).astype(jnp.int32), bits),
        scales=scales.astype(scale_dtype),
        zeros=zeros.astype(scale_dtype),
        perm=None,
        bits=bits,
        group_size=group_size,
        in_features=K,
        out_features=N,
        sym=False,
    )


class HQQQuantizer:
    """Data-free model quantizer (reference quant_hqq.py:18 forces an
    empty dataloader — calib data is accepted and ignored)."""

    def __init__(self, config: HQQConfig):
        self.config = config

    def quantize(
        self,
        params,
        model_cfg,
        calib_tokens=None,
        layer_overrides=None,
        progress=True,
    ):
        from .frame import quantize_params_uniform

        return quantize_params_uniform(
            params,
            lambda w, bits, gs: hqq_quantize_weight(
                w, bits, gs, config=self.config
            ),
            self.config.wbits,
            self.config.groupsize,
            layer_overrides=layer_overrides,
            progress=progress,
        )
