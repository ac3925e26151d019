"""Sequence-parallel decode attention over a mesh axis.

SURVEY §5's long-context requirement ("shard the quantized KV cache and
attention over the mesh; ring/blockwise attention in Pallas is the
TPU-native answer" — the reference has nothing here, §2.3): the int8 KV
cache is sharded on its sequence axis, every device runs the fused
Pallas partial kernel (ops.pallas_attention.decode_attention_partial)
on its local shard, and the exact softmax is reconstructed with a
log-sum-exp merge — one pmax + two psums of [B, H, d]-and-smaller
tensors per step, riding ICI. No device ever materializes the full
sequence, so max context scales linearly with the axis size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["sp_decode_attention", "sp_cache_pspecs"]


def sp_cache_pspecs(axis: str = "sp"):
    """PartitionSpecs for a layer-stacked quantized cache sharded on the
    sequence axis: k/v [L, B, Hkv, S, d], scales [L, B, Hkv, S]."""
    return P(None, None, None, axis, None), P(None, None, None, axis)


def sp_decode_attention(
    q: jax.Array,  # [B, H, d] (replicated over the sp axis)
    k_cache: jax.Array,  # [L, B, Hkv, S, d] int8, S sharded on `axis`
    v_cache: jax.Array,
    k_scale: jax.Array,  # [L, B, Hkv, S] f32, S sharded on `axis`
    v_scale: jax.Array,
    lengths: jax.Array,  # [B] int32 GLOBAL valid lengths
    layer: jax.Array,  # int32 scalar
    mesh: Mesh,
    axis: str = "sp",
) -> jax.Array:
    """Exact decode attention with the KV sequence axis sharded over
    ``mesh[axis]``; output replicated. Merge identity: with per-shard
    (acc_i, m_i, den_i) and m = max_i m_i,
    out = Σ_i acc_i·e^(m_i−m) / Σ_i den_i·e^(m_i−m)."""
    from ..ops.pallas_attention import decode_attention_partial

    n = mesh.shape[axis]
    S = k_cache.shape[3]
    if S % n:
        raise ValueError(f"cache seq {S} not divisible by mesh[{axis}]={n}")
    s_loc = S // n

    kv_spec, sc_spec = sp_cache_pspecs(axis)
    rep = P()

    def body(q, kc, vc, ks, vs, lens):
        idx = jax.lax.axis_index(axis)
        loc_len = jnp.clip(lens - idx * s_loc, 0, s_loc)
        acc, m, den = decode_attention_partial(
            q, kc, vc, ks, vs, loc_len, layer
        )
        m_g = jax.lax.pmax(m, axis)
        w = jnp.exp(m - m_g)
        den_g = jax.lax.psum(den * w, axis)
        acc_g = jax.lax.psum(acc * w, axis)
        return acc_g / den_g

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(rep, kv_spec, kv_spec, sc_spec, sc_spec, rep),
        out_specs=rep,
        check_vma=False,
    )
    return fn(q, k_cache, v_cache, k_scale, v_scale, lengths)
