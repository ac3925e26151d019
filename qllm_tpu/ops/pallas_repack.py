"""Pallas planar relayout for 4-bit packed weights: one read + one
write pass over the PACKED words.

quant.qtensor.planarize_packed (the jnp reference) unpacks every 4-bit
value into a uint32 — an 8x-inflated intermediate that makes serving
prep HBM-bound (the 128-expert qwen3-moe slab spent ~100 s of its prep
streaming planarize transients). The mapping is word-local, so it can
be done entirely with 32-bit shift/mask arithmetic in VMEM:

  source word i (GPTQ order) holds values k = 8i..8i+7 in nibbles 0..7
  planar word j holds, in byte b: value 4j+b in the LOW nibble and
  value K/2+4j+b in the HIGH nibble (ops.pallas_qmm planar contract)

so planar row 2m takes nibbles 0-3 (low 16 bits) of source rows m and
K/16+m, row 2m+1 nibbles 4-7 (high 16 bits) — a 4-nibble "deposit"
spread (16 bits -> one nibble per output byte) per half.

Used by models.stacked.prepare_stacked_tensor at load/stack time; the
jnp reference remains the fallback (CPU backend, odd shapes) and the
parity oracle (tests/test_ops.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["planarize_packed_pallas"]


def _deposit(x16):
    """Spread the 4 nibbles in the low 16 bits of ``x16`` into the low
    nibble of each of the 4 bytes of a uint32."""
    return (
        (x16 & jnp.uint32(0xF))
        | ((x16 & jnp.uint32(0xF0)) << 4)
        | ((x16 & jnp.uint32(0xF00)) << 8)
        | ((x16 & jnp.uint32(0xF000)) << 12)
    )


def _repack_kernel(in_ref, out_ref):
    lo = in_ref[0, 0]  # [br, bn] words for k in the low half
    hi = in_ref[0, 1]  # [br, bn] words for k in the high half
    even = _deposit(lo & jnp.uint32(0xFFFF)) | (
        _deposit(hi & jnp.uint32(0xFFFF)) << 4
    )
    odd = _deposit(lo >> 16) | (_deposit(hi >> 16) << 4)
    out_ref[0, :, 0, :] = even
    out_ref[0, :, 1, :] = odd


def _block(n: int, cap: int, quantum: int):
    """Largest divisor of ``n`` that is <= cap and a quantum multiple."""
    b = min(n, cap)
    b -= b % quantum
    while b >= quantum and n % b:
        b -= quantum
    return b if b >= quantum and n % b == 0 else 0


@functools.partial(jax.jit, static_argnames=("K",))
def _planarize_call(q4, K: int):
    E, _, R, N = q4.shape  # [E, 2, K//16, N]
    br = _block(R, 256, 8)
    bn = _block(N, 512, 128)
    out = pl.pallas_call(
        _repack_kernel,
        grid=(E, R // br, N // bn),
        in_specs=[
            pl.BlockSpec(
                (1, 2, br, bn),
                lambda e, r, n: (e, 0, r, n),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, br, 2, bn),
            lambda e, r, n: (e, r, 0, n),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((E, R, 2, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(q4)
    return out


def planarize_packed_ok(K: int, N: int) -> bool:
    """Shapes the kernel serves: K%16==0 rows split evenly and the
    lane/sublane blocks divide (N is lane-padded upstream)."""
    return (
        K % 16 == 0
        and (K // 16) % 8 == 0
        and N % 128 == 0
        and _block(K // 16, 256, 8) > 0
        and _block(N, 512, 128) > 0
    )


def planarize_packed_pallas(qweight: jax.Array, K: int) -> jax.Array:
    """planarize_packed semantics ([..., K//8, N] uint32 in, same shape
    planar out) without the unpacked-uint32 intermediate. Returns None
    when the shape doesn't qualify (caller falls back to the jnp
    reference)."""
    lead = qweight.shape[:-2]
    N = qweight.shape[-1]
    if qweight.dtype != jnp.uint32 or not planarize_packed_ok(K, N):
        return None
    E = int(np.prod(lead)) if lead else 1
    q4 = qweight.reshape(E, 2, K // 16, N)
    out = _planarize_call(q4, K)
    return out.reshape(*lead, K // 8, N)
