"""Quantized (INT8) KV cache.

The capability the reference's bundled-but-never-built ft_attention
extension promised (csrc/ft_attention/*, excluded from setup.py:173-194)
— delivered TPU-natively: an int8 per-(token, head) symmetric-scaled KV
cache stored as a pytree, updated functionally inside the jitted decode
step, consumed by the Pallas decode-attention kernel
(pallas_attention.py) or the XLA reference path.

Layout: k/v ``int8 [L, B, H_kv, S_max, D]``, scales ``[L, B, H_kv, S_max]``
float32. (S, D) are the trailing dims so each (batch, head) slice is a
contiguous [S, D] tile — exactly what the decode kernel streams; D sits
in lanes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["QuantizedKVCache"]


def _quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x [..., D] float -> (int8 [..., D], scale [...]) symmetric per-vector."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "k_scale", "v_scale", "ring_k", "ring_v"],
    meta_fields=["quantized"],
)
@dataclasses.dataclass(frozen=True)
class QuantizedKVCache:
    """KV cache for all layers. When quantized=False, k/v hold bf16 and
    the scale arrays are size-1 placeholders.

    ``ring_k/ring_v`` (optional, [L, B, H_kv, 8, D] bf16): the
    ring-fused decode path keeps the ≤8 most recent tokens unquantized
    here, appended by the attention kernel itself and flushed into the
    int8 cache once per 8 steps (ops.pallas_attention ring section) —
    the KV write then costs no extra kernel launch. None = classic
    per-token write path."""

    k: jax.Array  # [L, B, H_kv, S, D] int8 or bf16
    v: jax.Array
    k_scale: jax.Array  # [L, B, H_kv, S] f32 (placeholder if not quantized)
    v_scale: jax.Array
    quantized: bool
    ring_k: jax.Array = None  # [L, B, H_kv, 8, D] bf16 or None
    ring_v: jax.Array = None

    @classmethod
    def create(
        cls,
        n_layers: int,
        batch: int,
        max_seq: int,
        n_kv_heads: int,
        head_dim: int,
        quantized: bool = True,
        dtype=jnp.bfloat16,
        ring: bool = False,
    ) -> "QuantizedKVCache":
        shape = (n_layers, batch, n_kv_heads, max_seq, head_dim)
        if quantized:
            kv_dtype = jnp.int8
            sshape = (n_layers, batch, n_kv_heads, max_seq)
        else:
            kv_dtype = dtype
            sshape = (1,)
        if ring and not quantized:
            raise ValueError("the ring-fused path needs a quantized cache")
        if ring and max_seq % 8:
            raise ValueError("ring-fused path needs max_seq % 8 == 0")
        rshape = (n_layers, batch, n_kv_heads, 8, head_dim)
        return cls(
            k=jnp.zeros(shape, kv_dtype),
            v=jnp.zeros(shape, kv_dtype),
            k_scale=jnp.ones(sshape, jnp.float32),
            v_scale=jnp.ones(sshape, jnp.float32),
            quantized=quantized,
            ring_k=jnp.zeros(rshape, jnp.bfloat16) if ring else None,
            ring_v=jnp.zeros(rshape, jnp.bfloat16) if ring else None,
        )

    @property
    def max_seq(self) -> int:
        return self.k.shape[3]

    def update(
        self, layer: int, k_new: jax.Array, v_new: jax.Array, pos: jax.Array
    ) -> "QuantizedKVCache":
        """Write k_new/v_new [B, T, H_kv, D] at time offset ``pos``.

        ``pos`` may be a scalar (all sequences aligned) or an int32 [B]
        of per-slot offsets (continuous batching)."""
        k_new = k_new.transpose(0, 2, 1, 3)  # -> [B, H, T, D]
        v_new = v_new.transpose(0, 2, 1, 3)
        pos = jnp.asarray(pos)

        if pos.ndim == 0:
            if self.quantized:
                kq, ks = _quantize_kv(k_new)
                vq, vs = _quantize_kv(v_new)
                k = jax.lax.dynamic_update_slice(
                    self.k, kq[None], (layer, 0, 0, pos, 0)
                )
                v = jax.lax.dynamic_update_slice(
                    self.v, vq[None], (layer, 0, 0, pos, 0)
                )
                k_scale = jax.lax.dynamic_update_slice(
                    self.k_scale, ks[None], (layer, 0, 0, pos)
                )
                v_scale = jax.lax.dynamic_update_slice(
                    self.v_scale, vs[None], (layer, 0, 0, pos)
                )
                return dataclasses.replace(
                    self, k=k, v=v, k_scale=k_scale, v_scale=v_scale
                )
            k = jax.lax.dynamic_update_slice(
                self.k, k_new.astype(self.k.dtype)[None], (layer, 0, 0, pos, 0)
            )
            v = jax.lax.dynamic_update_slice(
                self.v, v_new.astype(self.v.dtype)[None], (layer, 0, 0, pos, 0)
            )
            return dataclasses.replace(self, k=k, v=v)

        # per-slot offsets: vmap the slice update over the batch dim
        def upd4(buf_b, new_b, p):  # [H, S, D], [H, T, D]
            return jax.lax.dynamic_update_slice(buf_b, new_b, (0, p, 0))

        def upd3(buf_b, new_b, p):  # [H, S], [H, T]
            return jax.lax.dynamic_update_slice(buf_b, new_b, (0, p))

        if self.quantized:
            kq, ks = _quantize_kv(k_new)
            vq, vs = _quantize_kv(v_new)
            k = self.k.at[layer].set(jax.vmap(upd4)(self.k[layer], kq, pos))
            v = self.v.at[layer].set(jax.vmap(upd4)(self.v[layer], vq, pos))
            k_scale = self.k_scale.at[layer].set(
                jax.vmap(upd3)(self.k_scale[layer], ks, pos)
            )
            v_scale = self.v_scale.at[layer].set(
                jax.vmap(upd3)(self.v_scale[layer], vs, pos)
            )
            return dataclasses.replace(
                self, k=k, v=v, k_scale=k_scale, v_scale=v_scale
            )
        k = self.k.at[layer].set(
            jax.vmap(upd4)(self.k[layer], k_new.astype(self.k.dtype), pos)
        )
        v = self.v.at[layer].set(
            jax.vmap(upd4)(self.v[layer], v_new.astype(self.v.dtype), pos)
        )
        return dataclasses.replace(self, k=k, v=v)

    def insert_slot(
        self, slot, other: "QuantizedKVCache"
    ) -> "QuantizedKVCache":
        """Copy a batch-1 cache (a finished prefill) into batch slot
        ``slot`` of this cache. Sequence lengths may differ (other's
        max_seq <= ours)."""
        S = other.max_seq

        def put5(buf, src):
            return jax.lax.dynamic_update_slice(
                buf, src, (0, slot, 0, 0, 0)
            )

        def put4(buf, src):
            return jax.lax.dynamic_update_slice(buf, src, (0, slot, 0, 0))

        out = dataclasses.replace(
            self,
            k=put5(self.k, other.k.astype(self.k.dtype)),
            v=put5(self.v, other.v.astype(self.v.dtype)),
        )
        if self.quantized:
            out = dataclasses.replace(
                out,
                k_scale=put4(self.k_scale, other.k_scale),
                v_scale=put4(self.v_scale, other.v_scale),
            )
        return out

    def insert_seq(
        self, other: "QuantizedKVCache", offset: int = 0
    ) -> "QuantizedKVCache":
        """Copy ``other``'s full sequence range into positions
        [offset, offset + other.max_seq) of this cache (batch sizes must
        match; quantized layouts copy verbatim — the per-position scales
        travel with their rows). Used by prefix caching: a stored
        prompt-prefix cache is stamped into a fresh admission cache, and
        only the suffix is prefilled."""

        def put5(buf, src):
            return jax.lax.dynamic_update_slice(
                buf, src, (0, 0, 0, offset, 0)
            )

        def put4(buf, src):
            return jax.lax.dynamic_update_slice(buf, src, (0, 0, 0, offset))

        out = dataclasses.replace(
            self,
            k=put5(self.k, other.k.astype(self.k.dtype)),
            v=put5(self.v, other.v.astype(self.v.dtype)),
        )
        if self.quantized:
            out = dataclasses.replace(
                out,
                k_scale=put4(self.k_scale, other.k_scale),
                v_scale=put4(self.v_scale, other.v_scale),
            )
        return out

    def layer_kv(self, layer: int, dtype=jnp.bfloat16):
        """Dequantized (k, v) [B, S, H_kv, D] for the XLA reference path."""
        k = self.k[layer]
        v = self.v[layer]
        if self.quantized:
            k = k.astype(jnp.float32) * self.k_scale[layer][..., None]
            v = v.astype(jnp.float32) * self.v_scale[layer][..., None]
        return (
            k.astype(dtype).transpose(0, 2, 1, 3),
            v.astype(dtype).transpose(0, 2, 1, 3),
        )

    def layer_kv_raw(self, layer: int):
        """Raw int8 (k, v, k_scale, v_scale) [B, H, S, D] for the Pallas
        decode kernel."""
        return (
            self.k[layer],
            self.v[layer],
            self.k_scale[layer],
            self.v_scale[layer],
        )
