"""Pallas fused decode attention over the INT8 KV cache.

The TPU delivery of what the reference bundled but never built
(csrc/ft_attention decoder_masked_multihead_attention, excluded from
setup.py:173-194): single-query attention against a quantized KV cache.

Design:
  * grid (B, H_kv); each program handles one (batch, kv-head) with its
    GQA query group [n_rep, d] — K/V stay int8 end-to-end in VMEM.
  * the per-token KV scales FOLD INTO THE MATMULS instead of
    dequantizing K/V: scores = (q·K_int8ᵀ)·ks and out = (p·vs)·V_int8,
    so the only element-wise int8->bf16 casts feed the MXU directly.
  * valid-length masking via per-batch ``lengths`` (continuous batching
    ready), fp32 softmax.

VMEM: K+V for one (b, h) at S=4096, d=128 is 1 MB — one-shot blocks
(no flash chunking needed at serving sequence lengths; revisit for
32k+ contexts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_attention_pallas"]


def _attn_kernel(
    lengths_ref,  # scalar prefetch: [B] int32 valid lengths
    q_ref,  # [1, hb, n_rep_p, d] bf16 (pre-scaled by 1/sqrt(d))
    k_ref,  # [1, hb, S, d] int8
    v_ref,  # [1, hb, S, d] int8
    ks_ref,  # [1, hb, 1, S] f32
    vs_ref,  # [1, hb, 1, S] f32
    o_ref,  # [1, hb, n_rep_p, d]
):
    b = pl.program_id(0)
    hb = k_ref.shape[1]
    length = lengths_ref[b]
    for h in range(hb):  # static head-block loop (amortizes per-program cost)
        q = q_ref[0, h]  # [n_rep_p, d]
        k = k_ref[0, h].astype(jnp.bfloat16)  # [S, d]
        ks = ks_ref[0, h]  # [1, S]
        scores = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [n_rep_p, S]
        scores = scores * ks
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < length, scores, -jnp.inf)

        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m)
        denom = jnp.sum(p, axis=1, keepdims=True)

        vs = vs_ref[0, h]  # [1, S]
        pv = (p * vs).astype(jnp.bfloat16)  # scale folded into probs
        v = v_ref[0, h].astype(jnp.bfloat16)  # [S, d]
        out = jnp.dot(pv, v, preferred_element_type=jnp.float32)
        o_ref[0, h] = (out / denom).astype(o_ref.dtype)


def _attn_kernel_stacked(
    lengths_ref,  # scalar prefetch: [B]
    layer_ref,  # scalar prefetch: [1] (consumed by index maps)
    q_ref,  # [1, hb, n_rep_p, d]
    k_ref,  # [1, 1, hb, S, d] int8 (layer-selected block)
    v_ref,
    ks_ref,  # [1, 1, hb, 1, S]
    vs_ref,
    o_ref,  # [1, hb, n_rep_p, d]
):
    del layer_ref

    class _V:
        def __init__(self, ref):
            self.ref = ref
            self.shape = ref.shape[1:]

        def __getitem__(self, idx):
            return self.ref[0][idx]

    _attn_kernel(
        lengths_ref, q_ref, _V(k_ref), _V(v_ref), _V(ks_ref), _V(vs_ref), o_ref
    )


@functools.partial(jax.jit, static_argnames=())
def _decode_attention_stacked(
    q, k_cache, v_cache, k_scale, v_scale, lengths, layer
):
    B, H, d = q.shape
    L, _, Hkv, S, _ = k_cache.shape
    n_rep = H // Hkv
    n_rep_p = max(8, ((n_rep + 7) // 8) * 8)
    qg = q.astype(jnp.float32) * (d**-0.5)
    qg = qg.reshape(B, Hkv, n_rep, d)
    if n_rep_p != n_rep:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, n_rep_p - n_rep), (0, 0)))
    qg = qg.astype(jnp.bfloat16)
    ks = k_scale.reshape(L, B, Hkv, 1, S).astype(jnp.float32)
    vs = v_scale.reshape(L, B, Hkv, 1, S).astype(jnp.float32)

    hb = 1
    for cand in (8, 4, 2):
        if Hkv % cand == 0 and 2 * cand * S * d <= 2 * 1024 * 1024:
            hb = cand
            break

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv // hb),
        in_specs=[
            pl.BlockSpec(
                (1, hb, n_rep_p, d),
                lambda b, h, *_: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hb, S, d),
                lambda b, h, lens, l: (l[0], b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hb, S, d),
                lambda b, h, lens, l: (l[0], b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hb, 1, S),
                lambda b, h, lens, l: (l[0], b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, hb, 1, S),
                lambda b, h, lens, l: (l[0], b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, n_rep_p, d),
            lambda b, h, *_: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _attn_kernel_stacked,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, n_rep_p, d), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(
        lengths.astype(jnp.int32),
        jnp.asarray([layer], jnp.int32),
        qg,
        k_cache,
        v_cache,
        ks,
        vs,
    )
    return out[:, :, :n_rep, :].reshape(B, H, d)


@functools.partial(jax.jit, static_argnames=())
def decode_attention_pallas(
    q: jax.Array,  # [B, H, d] queries for ONE decode step
    k_cache: jax.Array,  # [B, H_kv, S, d] int8 — or [L, B, H_kv, S, d]
    v_cache: jax.Array,  # (same shape as k_cache)
    k_scale: jax.Array,  # [B, H_kv, S] f32 — or [L, B, H_kv, S]
    v_scale: jax.Array,
    lengths: jax.Array,  # [B] int32: attend to cache[:length]
    layer: jax.Array = None,  # int32 scalar when caches carry the [L] axis
) -> jax.Array:
    if k_cache.ndim == 5:
        # layer-stacked caches: select the layer INSIDE the kernel's
        # index maps (a jnp slice here would copy ~MBs per step)
        return _decode_attention_stacked(
            q, k_cache, v_cache, k_scale, v_scale, lengths, layer
        )
    B, H, d = q.shape
    _, Hkv, S, _ = k_cache.shape
    n_rep = H // Hkv
    n_rep_p = max(8, ((n_rep + 7) // 8) * 8)  # sublane pad

    qg = q.astype(jnp.float32) * (d**-0.5)
    qg = qg.reshape(B, Hkv, n_rep, d)
    if n_rep_p != n_rep:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, n_rep_p - n_rep), (0, 0)))
    qg = qg.astype(jnp.bfloat16)
    ks = k_scale.reshape(B, Hkv, 1, S).astype(jnp.float32)
    vs = v_scale.reshape(B, Hkv, 1, S).astype(jnp.float32)

    # head-block: process several kv-heads per program (fewer programs,
    # larger DMA; bounded by ~2MB of int8 K+V per program)
    hb = 1
    for cand in (8, 4, 2):
        if Hkv % cand == 0 and 2 * cand * S * d <= 2 * 1024 * 1024:
            hb = cand
            break

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv // hb),
        in_specs=[
            pl.BlockSpec(
                (1, hb, n_rep_p, d), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hb, S, d), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hb, S, d), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hb, 1, S), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hb, 1, S), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, n_rep_p, d), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _attn_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, n_rep_p, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * S * d,
            bytes_accessed=2 * B * Hkv * S * d + B * H * d * 4,
            transcendentals=B * H * S,
        ),
        interpret=jax.default_backend() == "cpu",
    )(lengths.astype(jnp.int32), qg, k_cache, v_cache, ks, vs)
    return out[:, :, :n_rep, :].reshape(B, H, d)
