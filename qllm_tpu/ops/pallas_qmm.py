"""Pallas fused unpack → dequant → MXU matmul (W2/W4/W8, grouped scales).

The TPU replacement for the reference's CUDA dequant+GEMM/GEMV family
(csrc/ort_cuda/dq_gemv.cu:189-544, awq gemm_cuda_gen.cu) — ONE kernel
covers prefill (M large) and decode (M small), per SURVEY.md §2.2's
rebuild note.

Design (bandwidth-bound at W4: qweight bytes dominate):
  * qweight stays packed in HBM; blocks [bk/pf, bn] uint32 stream
    through VMEM (Pallas double-buffers automatically).
  * Unpacking avoids any sublane relayout: a K-packed word holds fields
    s = 0..pf-1 of rows k = r·pf+s, so the contraction is split into pf
    sub-matmuls — field s is extracted with one shift+mask (VPU),
    dequantized in place, and contributes dot(x[:, s::pf], w_s) on the
    MXU. The activation is pre-split OUTSIDE the kernel into
    xt[pf, M, K/pf] (one cheap XLA transpose of the small operand) so
    every in-kernel operand is contiguous.
  * Grouped scale/zero: blocks reshape [gpb, g/pf, bn] — sublane-only
    reshape, lanes untouched.
  * fp32 accumulator scratch across the k grid axis.

Odd bit-widths (3/5/6/7) use the bit-plane layout and fall back to the
XLA reference path (dequant fuses into the dot there); they are not on
the serving hot path.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.qtensor import QuantizedTensor

__all__ = ["qmatmul_pallas"]


def _rms_norm_rows(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """XLA rms-norm over the last axis (fallback when a fused-norm
    matmul request lands on a kernel path without in-kernel norm).
    Mirrors models.llama.rms_norm up to f32-vs-bf16 rounding of the
    weight product (the in-kernel fusion also multiplies in f32)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(
        x.dtype
    )


def _pick_block(dim: int, quantum: int, target: int) -> int:
    """Largest multiple of ``quantum`` that divides ``dim`` and is <= target
    (falls back to ``dim`` itself)."""
    best = None
    b = quantum
    while b <= min(dim, target):
        if dim % b == 0:
            best = b
        b += quantum
    return best if best is not None else dim


def _shrink_to_vmem(
    M: int,
    bm: int,
    bn: int,
    bk: int,
    pf: int,
    g: int,
    x_bytes: int,
    budget: int = 12 << 20,
) -> Tuple[int, int]:
    """Shrink (bm, bn) until the kernel's per-step VMEM working set fits.

    Mosaic's scoped-vmem stack is 16MB; double-buffered in/out blocks
    plus the accumulator scratch must fit. Irrelevant for decode (bm<=8)
    but prefill at bm=256 with a full-K fallback bk (e.g. K=11008, whose
    only group-aligned divisors are 128/256/5504/11008) overflows it.
    """

    def working_set(bm: int, bn: int) -> int:
        x_blk = bm * bk * x_bytes
        qw_blk = (bk // pf) * bn * 4
        sc_blk = max(1, bk // g) * bn * 4
        out_blk = bm * bn * 4
        return 2 * (x_blk + qw_blk + sc_blk + out_blk) + bm * bn * 4

    while working_set(bm, bn) > budget and (bm > 8 or bn > 128):
        if bm > 8:
            # any multiple of 8 dividing bm also divides M
            bm = _pick_block(bm, 8, bm // 2)
        else:
            bn = _pick_block(bn, 128, bn // 2)
    return bm, bn


def _choose_bk(K: int, g: int, pf: int, target: int) -> int:
    """k-block satisfying the Mosaic block constraints:
      * xt block last dim bk/pf: multiple of 128 (lanes) — bk % 128*pf == 0
      * scales block sublanes bk/g: multiple of 8 — bk % 8*g == 0 (when
        more than one group exists)
      * divides K.
    Falls back to bk == K (full-array blocks are exempt)."""
    import math

    G = K // g
    quantum = 128 * pf if G == 1 else math.lcm(128 * pf, 8 * g)
    best = None
    for bk in range(quantum, K + 1, quantum):
        if K % bk == 0 and bk <= target:
            best = bk
    return best if best is not None else K


def _qmm_kernel(
    xt_ref,  # [pf, bm, bk/pf] bf16
    qw_ref,  # [bk/pf, bn] uint32
    scale_ref,  # [gpb, bn] f32 (this k-block's groups, via BlockSpec)
    out_ref,  # [bm, bn]
    acc_ref,  # scratch [bm, bn] f32
    *,
    bits: int,
    bk: int,
    g: int,
    f32_dot: bool,
):
    """Computes y1 = sum_k x_k * q_k * s_g(k) — the ZERO-POINT TERM IS
    HANDLED OUTSIDE the kernel (y = y1 - xsum @ (z*s), one tiny XLA
    matmul): that removes a full-width subtract per field, and the
    per-group scale expands via pltpu.repeat (sublane broadcast, no
    3D reshape relayouts)."""
    pf = 32 // bits
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gpb = max(1, bk // g)  # groups per block
    span = min(g, bk) // pf  # packed rows per group within the block
    # [gpb, bn] -> [bk/pf, bn], row r scale = scales[r // span]; hoisted
    # out of the field loop so the relayout happens once per block
    bn_ = scale_ref.shape[-1]
    s_exp = jnp.broadcast_to(
        scale_ref[:][:, None, :], (gpb, span, bn_)
    ).reshape(gpb * span, bn_)

    # Mosaic lacks a uint32->f32 cast; masked fields are < 2**bits so a
    # bitcast to int32 is value-preserving and int32->f32 is supported.
    qw = pltpu.bitcast(qw_ref[:], jnp.int32)  # [bk/pf, bn]
    acc = acc_ref[:]
    for s in range(pf):
        vals = (
            jax.lax.shift_right_logical(qw, jnp.int32(bits * s))
            & jnp.int32((1 << bits) - 1)
        ).astype(jnp.float32)
        w_s = vals * s_exp
        # decode (small M, HBM-bound): f32 MXU dot — exact and one fewer
        # cast. prefill (large M, FLOP-bound): bf16 dot at full MXU rate.
        if not f32_dot:
            w_s = w_s.astype(jnp.bfloat16)
        acc = acc + jnp.dot(
            xt_ref[s], w_s, preferred_element_type=jnp.float32
        )
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _qmm_kernel_v3(
    xq_ref,  # [npar, gpb, bm, g/npar] x rearranged by field parity+group
    qw_ref,  # [bk/pf, bn] uint32
    scale_ref,  # [gpb, bn] f32
    out_ref,  # [bm, bn]
    acc_ref,  # scratch [bm, bn] f32
    *,
    bits: int,
    bk: int,
    g: int,
    f32_dot: bool,
):
    """SIMD-in-register unpack for 2/4-bit: one shift+AND against a
    byte-replicated mask extracts ``4`` fields at once; a bitcast
    u32->i8 lands them on sublanes in k-order (row i <-> k = npar*i+p).
    The per-group scale is applied AFTER depth-(g/npar) group dots, so
    per unpacked element only the i8->float cast remains on the VPU
    (~1.4 ops/elem vs 4 in the field-loop kernel)."""
    pf = 32 // bits
    npar = 8 // bits  # fields per byte
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gpb = bk // g
    seg = g // npar  # i8 rows per group per parity
    word_mask = 0
    for b in range(4):
        word_mask |= ((1 << bits) - 1) << (8 * b)

    qw = pltpu.bitcast(qw_ref[:], jnp.int32)
    # measured on v5e: i8->f32 cast + f32 dots beat i8->bf16 (the bf16
    # (16,128) retiling costs more than the f32 MXU rate penalty at the
    # small M this kernel variant serves)
    vs = []
    for p in range(npar):
        vp = (
            jax.lax.shift_right_logical(qw, jnp.int32(bits * p))
            & jnp.int32(word_mask)
        )
        vs.append(pltpu.bitcast(vp, jnp.int8).astype(jnp.float32))
    acc = acc_ref[:]
    for gi in range(gpb):
        part = None
        for p in range(npar):
            d = jnp.dot(
                xq_ref[p, gi],
                vs[p][gi * seg : (gi + 1) * seg],
                preferred_element_type=jnp.float32,
            )
            part = d if part is None else part + d
        acc = acc + part * scale_ref[gi : gi + 1, :]
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _qmm_kernel_w4a8(
    xq_ref,  # [npar, gpb, bm, seg] int8 (quantized activations)
    qw_ref,  # [bk/pf, bn] uint32
    scale_ref,  # [gpb, bn] f32
    out_ref,  # [bm, bn] f32
    acc_ref,  # scratch [bm, bn] f32
    *,
    bits: int,
    bk: int,
    g: int,
):
    """Pure-int8 MXU variant (opt-in, QLLM_TPU_W4A8=1): activations are
    per-token int8 (the token scale factors out of the whole contraction
    and is applied OUTSIDE the kernel), weights stay packed; the only
    per-element work is the shared shift+AND (amortized over 4 fields
    per byte). s8 x s8 -> s32 dots run at the MXU's integer rate."""
    pf = 32 // bits
    npar = 8 // bits
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gpb = bk // g
    seg = g // npar
    word_mask = 0
    for b in range(4):
        word_mask |= ((1 << bits) - 1) << (8 * b)

    qw = pltpu.bitcast(qw_ref[:], jnp.int32)
    vs = []
    for p in range(npar):
        vp = (
            jax.lax.shift_right_logical(qw, jnp.int32(bits * p))
            & jnp.int32(word_mask)
        )
        vs.append(pltpu.bitcast(vp, jnp.int8))  # [bk/npar, bn] — stays int8
    acc = acc_ref[:]
    for gi in range(gpb):
        d32 = None
        for p in range(npar):
            d = jax.lax.dot_general(
                xq_ref[p, gi],
                vs[p][gi * seg : (gi + 1) * seg],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            d32 = d if d32 is None else d32 + d
        acc = acc + d32.astype(jnp.float32) * scale_ref[gi : gi + 1, :]
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("bits", "group_size", "in_features", "out_features")
)
def _qmm_2d(
    x: jax.Array,  # [M, K] — M already padded to a multiple of 8
    qweight: jax.Array,
    scales: jax.Array,
    zeros: jax.Array,
    bits: int,
    group_size: int,
    in_features: int,
    out_features: int,
) -> jax.Array:
    K, N = in_features, out_features
    M = x.shape[0]
    pf = 32 // bits
    g = K if group_size == -1 else group_size
    G = K // g

    bk_target = int(
        os.environ.get("QLLM_TPU_QMM_BK", "2048" if M <= 32 else "512")
    )
    bn_target = int(os.environ.get("QLLM_TPU_QMM_BN", "512"))
    bk = _choose_bk(K, g, pf, bk_target)
    bn = _pick_block(N, 128, bn_target)
    bm = M if M <= 256 else _pick_block(M, 8, 256)

    f32_dot = M <= 32
    in_dt = jnp.float32 if f32_dot else jnp.bfloat16
    bm, bn = _shrink_to_vmem(M, bm, bn, bk, pf, g, 4 if f32_dot else 2)
    xf = x.astype(jnp.float32)
    scales = scales.astype(jnp.float32)
    zeros = zeros.astype(jnp.float32)
    grid = (M // bm, N // bn, K // bk)
    flops = 2 * M * N * K
    bytes_accessed = qweight.size * 4 + scales.size * 4 + M * K * 2 + M * N * 2
    common = dict(
        compiler_params=pltpu.CompilerParams(
            # i/j tiles are independent; only the k (reduction) axis
            # carries the accumulator — lets Mosaic pipeline harder
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        # f32 out: y1 carries the (uncorrected) zero-point mass, ~8x the
        # final magnitude — bf16 here would eat precision before the
        # correction subtract
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        # interpreter mode keeps the kernel testable on the CPU mesh
        interpret=jax.default_backend() == "cpu",
    )

    npar = 8 // bits if bits in (2, 4) else 0
    v3_ok = (
        bits in (2, 4)
        and M <= 32  # prefill (MXU-bound) does better on full-depth v2
        and bk % g == 0
        and (g // npar) % 8 == 0
    )
    use_w4a8 = v3_ok and bool(os.environ.get("QLLM_TPU_W4A8"))
    use_v3 = v3_ok and not use_w4a8 and not os.environ.get("QLLM_TPU_QMM_V2")
    if use_w4a8:
        seg = g // npar
        G_all = K // g
        # per-token symmetric int8 activations; the token scale factors
        # out of the whole contraction -> applied outside
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1), 1e-8) / 127.0  # [M]
        x8 = jnp.clip(jnp.round(xf / sx[:, None]), -127, 127).astype(jnp.int8)
        xq8 = (
            x8.reshape(M, G_all, seg, npar).transpose(3, 1, 0, 2)
        )  # [npar, G, M, seg] int8
        kernel = functools.partial(_qmm_kernel_w4a8, bits=bits, bk=bk, g=g)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (npar, bk // g, bm, seg),
                    lambda i, j, k: (0, k, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (bk // pf, bn),
                    lambda i, j, k: (k, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (bk // g, bn),
                    lambda i, j, k: (k, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            **common,
        )(xq8, qweight, scales)
        # y = sx * y1_int - sx * sum8 @ (z*s)
        sum8 = x8.astype(jnp.float32).reshape(M, G, g).sum(axis=2)
        zs = zeros * scales
        corr = jnp.dot(sum8, zs, preferred_element_type=jnp.float32)
        return ((out - corr) * sx[:, None]).astype(jnp.bfloat16)
    if use_v3:
        seg = g // npar
        G_all = K // g
        xq = (
            x.astype(jnp.float32)
            .reshape(M, G_all, seg, npar)
            .transpose(3, 1, 0, 2)  # [npar, G, M, seg]
        )
        kernel = functools.partial(
            _qmm_kernel_v3, bits=bits, bk=bk, g=g, f32_dot=f32_dot
        )
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (npar, bk // g, bm, seg),
                    lambda i, j, k: (0, k, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (bk // pf, bn),
                    lambda i, j, k: (k, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (bk // g, bn),
                    lambda i, j, k: (k, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            **common,
        )(xq, qweight, scales)
    else:
        xt = (
            x.astype(in_dt)
            .reshape(M, K // pf, pf)
            .transpose(2, 0, 1)  # [pf, M, K/pf]
        )
        kernel = functools.partial(
            _qmm_kernel, bits=bits, bk=bk, g=g, f32_dot=f32_dot
        )
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (pf, bm, bk // pf),
                    lambda i, j, k: (0, i, k),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (bk // pf, bn),
                    lambda i, j, k: (k, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (max(1, bk // g), bn),
                    (lambda i, j, k: (k, j))
                    if bk >= g
                    else (lambda i, j, k: (k * bk // g, j)),
                    memory_space=pltpu.VMEM,
                ),
            ],
            **common,
        )(xt, qweight, scales)
    if os.environ.get("QLLM_TPU_QMM_NOCORR"):  # timing experiments ONLY
        return out.astype(jnp.bfloat16)
    # zero-point correction outside the kernel: y -= xsum_g @ (z*s)
    xsum = xf.reshape(M, G, g).sum(axis=2)  # [M, G]
    zs = zeros * scales  # [G, N]
    corr = jnp.dot(xsum, zs, preferred_element_type=jnp.float32)
    return (out - corr).astype(jnp.bfloat16)


def _qmm_kernel_v3_stacked(
    layer_ref,  # scalar prefetch: [1] int32 layer index
    xq_ref,  # [npar, gpb, bm, seg]
    qw_ref,  # [1, bk/pf, bn] uint32 (layer_ref-indexed block of the stack)
    scale_ref,  # [1, gpb, bn] f32
    out_ref,
    acc_ref,
    *,
    bits: int,
    bk: int,
    g: int,
    f32_dot: bool,
):
    del layer_ref  # consumed by the index maps

    class _V:
        """Adapter presenting the leading-1 blocks as 2D refs."""

        def __init__(self, ref):
            self.ref = ref
            self.shape = ref.shape[1:]

        def __getitem__(self, idx):
            return self.ref[0][idx]

    _qmm_kernel_v3(
        xq_ref,
        _V(qw_ref),
        _V(scale_ref),
        out_ref,
        acc_ref,
        bits=bits,
        bk=bk,
        g=g,
        f32_dot=f32_dot,
    )


def _qmm_kernel_v4_stacked(
    layer_ref,  # scalar prefetch [1]
    xq_ref,  # [npar, gpb, bm, seg] f32
    qw_ref,  # [1, bk/pf, bn] uint32
    scale_ref,  # [1, gpb, bn] f32 or bf16
    zs_ref,  # [1, gpb, bn] f32 or bf16 (zs = zeros * scales, prefolded)
    out_ref,  # [bm, bn] f32
    acc_ref,
    *,
    bits: int,
    bk: int,
    g: int,
):
    """v3 + IN-KERNEL zero-point correction: per group the kernel also
    accumulates -xsum_g ⊗ zs_g (one [bm,1]x[1,bn] outer product on the
    VPU). Unlike round-1's reverted experiment (a full correction DOT at
    k==0, which stalled the k-pipeline), the subtraction is distributed
    across the k grid alongside the group dots, so nothing outside the
    kernel reads the [L, G, N] zs stack — that external dot profiled at
    ~0.4 ms/token on 7B. Scales/zs may be stored bf16 (cast per block
    in VMEM): halves scale bytes; ~2^-9 relative scale error, well under
    4-bit quantization noise."""
    del layer_ref
    pf = 32 // bits
    npar = 8 // bits
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gpb = bk // g
    seg = g // npar
    word_mask = 0
    for b in range(4):
        word_mask |= ((1 << bits) - 1) << (8 * b)

    qw = pltpu.bitcast(qw_ref[0], jnp.int32)
    vs = []
    for p in range(npar):
        vp = (
            jax.lax.shift_right_logical(qw, jnp.int32(bits * p))
            & jnp.int32(word_mask)
        )
        vs.append(pltpu.bitcast(vp, jnp.int8).astype(jnp.float32))
    sc = scale_ref[0].astype(jnp.float32)
    zs = zs_ref[0].astype(jnp.float32)
    acc = acc_ref[:]
    for gi in range(gpb):
        part = None
        xsum = None
        for p in range(npar):
            xpg = xq_ref[p, gi]  # [bm, seg]
            d = jnp.dot(
                xpg,
                vs[p][gi * seg : (gi + 1) * seg],
                preferred_element_type=jnp.float32,
            )
            part = d if part is None else part + d
            s1 = jnp.sum(xpg, axis=1, keepdims=True)
            xsum = s1 if xsum is None else xsum + s1
        acc = acc + part * sc[gi : gi + 1, :] - xsum * zs[gi : gi + 1, :]
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _qmm_kernel_w4a8_v3_stacked(
    layer_ref,  # scalar prefetch [1]
    xq_ref,  # [npar, gpb, bm, seg] int8 (quantized activations)
    qw_ref,  # [1, bk/pf, bn] uint32
    scale_ref,  # [1, gpb, bn] f32 or bf16
    out_ref,  # [bm, bn] f32
    acc_ref,
    *,
    bits: int,
    bk: int,
    g: int,
):
    """W4A8 for the packed v3 layout (the one TP shards run — row
    sharding splits the planar word, see _qmm_kernel_planar_full's a8
    mode for the single-chip planar variant): int8 activations, int8
    dequant fields, s8 x s8 -> s32 MXU dots, per-group scale to f32.
    Zero-point correction and the per-token scale are applied OUTSIDE
    (the v3 family's default — in-kernel outer products measurably slow
    this layout)."""
    del layer_ref
    npar = 8 // bits
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gpb = bk // g
    seg = g // npar
    word_mask = 0
    for b in range(4):
        word_mask |= ((1 << bits) - 1) << (8 * b)

    qw = pltpu.bitcast(qw_ref[0], jnp.int32)
    vs = []
    for p in range(npar):
        vp = (
            jax.lax.shift_right_logical(qw, jnp.int32(bits * p))
            & jnp.int32(word_mask)
        )
        vs.append(pltpu.bitcast(vp, jnp.int8))  # stays int8
    sc = scale_ref[0].astype(jnp.float32)
    acc = acc_ref[:]
    for gi in range(gpb):
        d32 = None
        for p in range(npar):
            d = jax.lax.dot_general(
                xq_ref[p, gi],
                vs[p][gi * seg : (gi + 1) * seg],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            d32 = d if d32 is None else d32 + d
        acc = acc + d32.astype(jnp.float32) * sc[gi : gi + 1, :]
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _choose_bk_odd(K: int, g: int, target: int):
    """k-block for the odd-bit (bit-plane) stacked kernel, or None.

    Constraints: bk % g == 0 (group boundary), bk % 256 == 0 (the
    [bk/32, bn] plane block's sublane dim must be a multiple of 8), and
    (bk//g) % 8 == 0 for the scale block's sublane quantum — unless
    bk == K, where the scale block spans the full group axis (full-dim
    blocks are exempt from the sublane quantum)."""
    import math

    if g <= 0 or K % 32 or K % g:
        return None
    quantum = math.lcm(256, 8 * g)
    best = None
    for bk in range(quantum, K + 1, quantum):
        if K % bk == 0 and bk <= target:
            best = bk
    if best is None and K % 256 == 0:
        best = K
    return best


def odd_stacked_kernel_ok(K: int, g: int) -> bool:
    """Whether the fused bit-plane decode kernel can serve this (K, g)
    geometry at packed bytes (no promote_bits repack needed)."""
    g_eff = K if g == -1 else g
    target = int(os.environ.get("QLLM_TPU_QMM_BK", "2048"))
    return g_eff % 8 == 0 and _choose_bk_odd(K, g_eff, target) is not None


def _qmm_kernel_odd_stacked(
    layer_ref,  # scalar prefetch [1]
    xq_ref,  # [8, gpb, bm, g/8] f32 — stride-8 field split of x
    qw_ref,  # [1, bits, bk/32, bn] uint32 bit-plane block
    scale_ref,  # [1, gpb, bn] f32 or bf16
    *rest,  # [zs_ref,] out_ref, acc_ref
    bits: int,
    bk: int,
    g: int,
    fuse_corr: bool,
):
    """Fused dequant+matmul for odd widths (3/5/6/7) on the bit-plane
    layout — the TPU answer to the reference's `..._357_g`/`3567_v2`
    CUDA families (csrc/ort_cuda/dq_gemv.cu:189-544), which serve odd
    widths at packed bytes instead of promote_bits' +33% repack.

    SIMD-in-register reconstruction: plane word bits (8c + p) hold rows
    k = 32w + 8c + p, so shifting plane b right by p and masking
    0x01010101 extracts field p's bit-b as bytes; summing planes shifted
    left by b rebuilds q (< 2**bits <= 128: no byte overflow) entirely
    in int32 lanes, then ONE bitcast lands rows on sublanes in k-order
    (stride 8). The dot structure matches _qmm_kernel_v3 with npar=8."""
    del layer_ref
    if fuse_corr:
        zs_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gpb = bk // g
    seg = g // 8
    planes = [pltpu.bitcast(qw_ref[0, b], jnp.int32) for b in range(bits)]
    sc = scale_ref[0].astype(jnp.float32)
    zs = zs_ref[0].astype(jnp.float32) if fuse_corr else None
    vs = []
    for p in range(8):
        v32 = None
        for b in range(bits):
            f = jax.lax.shift_right_logical(planes[b], jnp.int32(p)) & jnp.int32(
                0x01010101
            )
            if b:
                f = jax.lax.shift_left(f, jnp.int32(b))
            v32 = f if v32 is None else v32 + f
        vs.append(pltpu.bitcast(v32, jnp.int8).astype(jnp.float32))
    acc = acc_ref[:]
    for gi in range(gpb):
        part = None
        xsum = None
        for p in range(8):
            xpg = xq_ref[p, gi]  # [bm, seg]
            d = jnp.dot(
                xpg,
                vs[p][gi * seg : (gi + 1) * seg],
                preferred_element_type=jnp.float32,
            )
            part = d if part is None else part + d
            if fuse_corr:
                s1 = jnp.sum(xpg, axis=1, keepdims=True)
                xsum = s1 if xsum is None else xsum + s1
        acc = acc + part * sc[gi : gi + 1, :]
        if fuse_corr:
            acc = acc - xsum * zs[gi : gi + 1, :]
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _qmm_kernel_planar_fused(
    layer_ref,  # scalar prefetch [1]
    xlo_ref,  # [bm, bk/2] f32
    xhi_ref,
    qw_ref,  # [1, bk/8, bn] uint32 planar
    slo_ref,  # [1, 1, gpbh, bn] (4D: gpbh dim whole-block, any size)
    shi_ref,
    zlo_ref,  # [1, 1, gpbh, bn] (prefolded zs)
    zhi_ref,
    out_ref,
    acc_ref,
    *,
    bk: int,
    g: int,
):
    """Planar kernel + in-kernel correction (see _qmm_kernel_v4_stacked)."""
    del layer_ref
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gpbh = (bk // 2) // g
    qw = pltpu.bitcast(qw_ref[0], jnp.int32)
    v_lo = pltpu.bitcast(qw & jnp.int32(0x0F0F0F0F), jnp.int8).astype(
        jnp.float32
    )
    v_hi = pltpu.bitcast(
        jax.lax.shift_right_logical(qw, jnp.int32(4)) & jnp.int32(0x0F0F0F0F),
        jnp.int8,
    ).astype(jnp.float32)
    acc = acc_ref[:]
    big_dot = xlo_ref.shape[0] > 32  # prefill blocks: MXU-bound regime
    for x_ref, v, s_ref, z_ref in (
        (xlo_ref, v_lo, slo_ref, zlo_ref),
        (xhi_ref, v_hi, shi_ref, zhi_ref),
    ):
        sc = s_ref[0, 0].astype(jnp.float32)
        zs = z_ref[0, 0].astype(jnp.float32)
        if big_dot:
            # dequant the whole half-block ONCE (VPU) and run a single
            # full-depth bf16 dot: per-group depth-g dots underfill the
            # MXU pipeline at prefill (measured 204 ms vs the ~140 ms
            # flops floor at T=2048); dequantized w = v*s - zs exactly
            # (zs prefolded), bf16 rounding as in the dense-dequant ref
            bn_w = v.shape[1]
            w = (
                v.reshape(gpbh, g, bn_w) * sc[:, None, :] - zs[:, None, :]
            ).reshape(gpbh * g, bn_w).astype(jnp.bfloat16)
            acc = acc + jnp.dot(
                x_ref[:, :].astype(jnp.bfloat16),
                w,
                preferred_element_type=jnp.float32,
            )
            continue
        for gi in range(gpbh):
            xg = x_ref[:, gi * g : (gi + 1) * g].astype(jnp.float32)
            d = jnp.dot(
                xg, v[gi * g : (gi + 1) * g], preferred_element_type=jnp.float32
            )
            xsum = jnp.sum(xg, axis=1, keepdims=True)
            acc = acc + d * sc[gi : gi + 1, :] - xsum * zs[gi : gi + 1, :]
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


def planar_full_ok(K: int, g: int) -> bool:
    """Eligibility for the single-k-step full-K planar kernel: needs
    only K % 256 == 0 and a group split at K/2 — covers geometries the
    blocked variant cannot (e.g. llama down_proj K=11008, which has no
    2048-multiple divisor). Scale blocks span the FULL group axis (a
    whole-dim block is exempt from the 8-sublane quantum), so the
    16g-alignment constraint of planar_bk disappears."""
    return g > 0 and K % 256 == 0 and (K // 2) % g == 0


def _qmm_kernel_planar_full(
    layer_ref,  # scalar prefetch [1]
    x_ref,  # [bm, K] f32/bf16 — the whole activation row (int8 when a8)
    *refs,  # ([nw_ref [1, K] when norm]), qw_ref, s_ref, z_ref, out_ref
    K: int,
    g: int,
    norm: bool = False,
    eps: float = 1e-6,
    a8: bool = False,
):
    """Full-K planar kernel with fused correction: one k step (the k
    pipeline moves to the j/N grid axis, whose blocks are bigger and
    stream better — down_proj profiled at ~690 GB/s with full-K blocks
    vs ~460 GB/s blocked).

    ``norm``: fuse the pre-matmul RMSNorm — the whole x row is already
    in VMEM, so the row mean costs nothing extra and the [1, D]
    normalize+scale XLA fusions (+ their reductions) disappear from the
    decode step. Recomputed per N-block: VPU math fully hidden under
    the weight stream."""
    del layer_ref
    if norm:
        nw_ref, qw_ref, s_ref, z_ref, out_ref = refs
    else:
        qw_ref, s_ref, z_ref, out_ref = refs
    if a8 and norm:
        raise ValueError("a8 kernel does not fuse the norm (prenormalize)")
    # Compute dtype experiment (QLLM_TPU_QMM_BF16_DOT=1): int4 values
    # 0..15 are exact in bf16 and bf16xbf16+f32-acc is the MXU's native
    # mode — but MEASURED SLOWER on v5e (gateup 4096x22016 full-K:
    # 85.1 us bf16 vs 70.0 us f32 traced; 2026-08-19 microbench_qmm).
    # The kernel is HBM-bound, the dot is not the bottleneck, and
    # Mosaic's int8->bf16 relayout costs more VPU time than int8->f32.
    # Kept as an env-gated experiment, default OFF.
    cdt = (
        jnp.bfloat16
        if os.environ.get("QLLM_TPU_QMM_BF16_DOT", "0") == "1"
        else jnp.float32
    )
    if a8:
        cdt = jnp.int8  # int8 x int8 -> int32 MXU dots, no dequant cast
    Gh = (K // 2) // g
    qw = pltpu.bitcast(qw_ref[0], jnp.int32)
    v_lo = pltpu.bitcast(qw & jnp.int32(0x0F0F0F0F), jnp.int8).astype(cdt)
    v_hi = pltpu.bitcast(
        jax.lax.shift_right_logical(qw, jnp.int32(4)) & jnp.int32(0x0F0F0F0F),
        jnp.int8,
    ).astype(cdt)
    sc = s_ref[0].astype(jnp.float32)  # [G, bn]
    zs = z_ref[0].astype(jnp.float32)
    xn = nw = None
    if norm:
        xf = x_ref[:, :].astype(jnp.float32)  # [bm, K]
        # sum * literal instead of jnp.mean: mean's 1/K reciprocal
        # materializes as a captured f32[] constant that pallas rejects
        var = jnp.sum(xf * xf, axis=1, keepdims=True) * float(1.0 / K)
        xn = xf * jax.lax.rsqrt(var + float(eps))
        # [G, g] layout so each group's weights broadcast from a [1, g]
        # slice of a multi-sublane block — the same pattern the scale
        # multiply uses (a flat [1, K] block broadcast is an "Invalid
        # input layout" in Mosaic)
        nw = nw_ref[0].astype(jnp.float32)  # [G, g]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    if x_ref.shape[0] > 32 and not a8 and not norm:
        # prefill big-dot: dequant each half once, one full-depth bf16
        # dot per half (see _qmm_kernel_planar_fused's big_dot branch)
        bn_w = v_lo.shape[1]
        for half, v in ((0, v_lo), (1, v_hi)):
            base = half * Gh
            off = half * (K // 2)
            # separate slice and axis-insert: the combined
            # sc[a:b, None, :] lowers to a gather Mosaic rejects
            sc_h = sc[base : base + Gh]
            zs_h = zs[base : base + Gh]
            w = (
                v.reshape(Gh, g, bn_w) * sc_h[:, None, :]
                - zs_h[:, None, :]
            ).reshape(K // 2, bn_w).astype(jnp.bfloat16)
            acc = acc + jnp.dot(
                x_ref[:, off : off + K // 2].astype(jnp.bfloat16),
                w,
                preferred_element_type=jnp.float32,
            )
        out_ref[:] = acc
        return
    for half, v in ((0, v_lo), (1, v_hi)):
        base = half * Gh
        off = half * (K // 2)
        for gi in range(Gh):
            sl = slice(off + gi * g, off + (gi + 1) * g)
            if norm:
                xg = (xn[:, sl] * nw[base + gi : base + gi + 1, :]).astype(
                    cdt
                )
            else:
                # x may arrive bf16 (halves the per-grid-step x re-read —
                # the x block is fetched once per N-block, 25% of
                # down_proj's traffic at K=11008 f32); cast is free
                # relative to that
                xg = x_ref[:, sl].astype(cdt)
            if a8:
                # s8 x s8 -> s32: integer-rate MXU; exact (|acc| <=
                # 127*15*K << 2^31), scaled to f32 once per group
                d = jnp.dot(
                    xg,
                    v[gi * g : (gi + 1) * g],
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
            else:
                d = jnp.dot(
                    xg,
                    v[gi * g : (gi + 1) * g],
                    preferred_element_type=jnp.float32,
                )
            xsum = jnp.sum(
                xg.astype(jnp.float32), axis=1, keepdims=True
            )
            acc = (
                acc
                + d * sc[base + gi : base + gi + 1, :]
                - xsum * zs[base + gi : base + gi + 1, :]
            )
    out_ref[:] = acc


def planar_bk(K: int, g: int, target: int = 2048):
    """k-block for the planar kernel, or None when the geometry does not
    admit one: bk | K, bk % 16g == 0 (half-block holds >=8 whole groups
    for the scale BlockSpec), bk % 256 == 0 (x half-lane alignment),
    and G even."""
    if g <= 0 or K % (2 * g):
        return None
    import math

    quantum = math.lcm(256, 16 * g)
    best = None
    for bk in range(quantum, K + 1, quantum):
        if K % bk == 0 and bk <= target:
            best = bk
    return best


def planar_bk_relaxed(K: int, g: int, target: int = 2048):
    """k-block for the planar kernel with the 16g scale-block quantum
    RELAXED to whole groups only: bk | K, bk % 256 == 0 (x half-lane
    alignment), bk % 2g == 0 (gpbh integer). Scale BlockSpecs shrink to
    (1, gpbh, bn) with gpbh as small as 1 — Mosaic pads the sublane dim.

    This exists for the PREFILL of geometries planar_bk rejects, e.g.
    llama down_proj K=11008 = 2^8*43: no multiple-of-2048 divisor, but
    bk=256 divides it exactly, so the bm-blocked MXU kernel can serve
    prefill instead of the VMEM-capped full-K variant (which must
    materialize f32 [K/2, bn] dequant planes and shrink its blocks).
    Decode keeps the full-K kernel — at M<=32 it is HBM-bound and at its
    measured pattern ceiling (reports/ceiling_r3.md)."""
    if g <= 0 or K % (2 * g):
        return None
    import math

    quantum = math.lcm(256, 2 * g)
    best = None
    for bk in range(quantum, min(K, target) + 1, quantum):
        if K % bk == 0:
            best = bk
    return best


def _qmm_kernel_planar(
    layer_ref,  # scalar prefetch [1]
    xlo_ref,  # [bm, bk/2] f32 (low-half lanes of x)
    xhi_ref,  # [bm, bk/2] f32
    qw_ref,  # [1, bk/8, bn] uint32 planar
    slo_ref,  # [1, 1, gpbh, bn] f32 (4D: gpbh dim whole-block, any size)
    shi_ref,  # [1, 1, gpbh, bn] f32
    out_ref,  # [bm, bn] f32
    acc_ref,
    *,
    bk: int,
    g: int,
):
    """Planar 4-bit kernel: the bitcast yields k-CONTIGUOUS int8 rows,
    so the activation is consumed as two aligned lane-slices of the
    original [M, K] — no host-side transpose/relayout at all, and the
    per-group dots run at depth g (128)."""
    del layer_ref
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gpbh = (bk // 2) // g
    qw = pltpu.bitcast(qw_ref[0], jnp.int32)  # [bk/8, bn]
    v_lo = pltpu.bitcast(qw & jnp.int32(0x0F0F0F0F), jnp.int8).astype(
        jnp.float32
    )  # [bk/2, bn], row i <-> k-offset i
    v_hi = pltpu.bitcast(
        jax.lax.shift_right_logical(qw, jnp.int32(4)) & jnp.int32(0x0F0F0F0F),
        jnp.int8,
    ).astype(jnp.float32)
    acc = acc_ref[:]
    for x_ref, v, s_ref in ((xlo_ref, v_lo, slo_ref), (xhi_ref, v_hi, shi_ref)):
        for gi in range(gpbh):
            d = jnp.dot(
                x_ref[:, gi * g : (gi + 1) * g].astype(jnp.float32),
                v[gi * g : (gi + 1) * g],
                preferred_element_type=jnp.float32,
            )
            acc = acc + d * s_ref[0, 0, gi : gi + 1, :]
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "bits",
        "group_size",
        "in_features",
        "out_features",
        "planar",
        "prefolded",
        "fuse_corr",
        "bn_opt",
        "bk_opt",
        "norm_eps",
    ),
)
def _qmm_2d_stacked(
    x: jax.Array,  # [M, K] padded
    layer: jax.Array,  # scalar int32
    qweight: jax.Array,  # [L, K/pf, N]
    scales: jax.Array,  # [L, G, N]
    zeros: jax.Array,  # [L, G, N]
    bits: int,
    group_size: int,
    in_features: int,
    out_features: int,
    planar: bool = False,
    prefolded: bool = False,
    fuse_corr: bool = False,
    bn_opt: int = 0,
    bk_opt: int = 0,
    norm_w: Optional[jax.Array] = None,  # [L, K] stacked rms-norm weights
    norm_eps: float = 1e-6,
) -> jax.Array:
    """v3 decode kernel reading DIRECTLY from a layer-stacked weight
    pytree: the layer index arrives by scalar prefetch and selects
    blocks in the index maps — no dynamic-slice materialization of the
    layer's weights (profiling showed that copy costs more than the
    whole kernel). ``prefolded``: the zeros stack already holds
    zs = zeros * scales (models.stacked pre-fold). ``bn_opt/bk_opt``:
    explicit block sizes (autotuner / sweeps); 0 = env/default.
    ``norm_w``: fuse x = rms_norm(x, norm_w[layer]) into the matmul —
    only the full-K planar kernel does it in-kernel; every other path
    falls back to an XLA pre-normalize (still correct)."""
    K, N = in_features, out_features
    M = x.shape[0]
    pf = 32 // bits
    g = K if group_size == -1 else group_size
    G = K // g
    npar = 8 // bits
    bn = bn_opt or _pick_block(
        N, 128, int(os.environ.get("QLLM_TPU_QMM_BN", "512"))
    )
    bm = M
    if M > 32 and planar:
        # PREFILL through the stacked planar kernels (M = token count):
        # block the row axis instead of falling back to XLA relayout —
        # the unplanarize/repack chain profiled at 205 ms of a 437 ms
        # T=2048 7B prefill. Weight re-reads cost (M/bm)x stack bytes,
        # far below the relayout it replaces.
        bm = _pick_block(M, 8, 256)
    bk_target = bk_opt or int(os.environ.get("QLLM_TPU_QMM_BK", "2048"))

    if norm_w is not None and not planar:
        # in-kernel norm exists only in the full-K planar kernel
        x = _rms_norm_rows(x, norm_w[layer], norm_eps)
        norm_w = None
    if planar:
        if fuse_corr and not prefolded:
            raise ValueError("fuse_corr requires prefolded zeros (zs)")
        bkp = planar_bk(K, g, bk_target)
        if bkp is None:
            # a tuned/env bk below the geometry's quantum (lcm(256, 16g))
            # admits no block — fall back to the largest admissible one
            # rather than failing (tuned picks are swept on the
            # fused-correction path, whose full-K variant ignores bk)
            bkp = planar_bk(K, g, K)
        full_bytes = (K // 8) * bn * 4
        use_full = (
            fuse_corr
            and planar_full_ok(K, g)
            and full_bytes
            <= int(os.environ.get("QLLM_TPU_QMM_FULLK_MAX", str(4 << 20)))
            # at prefill the blocked kernel wins when the geometry
            # admits a k-block: the full-K variant materializes
            # f32 [K/2, bn] dequant planes that crowd VMEM at large bm.
            # EXCEPTION: 16g-quantum-rejected geometries (llama down
            # K=11008 = 2^8*43 — no 2048-multiple divisor) stay on the
            # full-K variant even at prefill: A/B on v5e measured the
            # VMEM-shrunk full-K at 149 TFLOP/s vs 140 for the relaxed
            # bk=256 blocked kernel (tools/ab_prefill_relaxed_bk.py)
            and (M <= 32 or bkp is None)
        )
        if (
            not use_full
            and M > 32
            and fuse_corr
            and planar_full_ok(K, g)
            and os.environ.get("QLLM_TPU_W4A8") == "1"
            and os.environ.get("QLLM_TPU_QMM_PREFILL_FULLK_A8") == "1"
        ):
            # W4A8-prefill experiment switch (tools/ab_a8_prefill.py):
            # route blocked-eligible shapes through the full-K kernel's
            # int8-dot path at M>32 to measure the integer-rate regime
            use_full = True
        if (
            not use_full
            and bkp is None
            and M > 32
            and os.environ.get("QLLM_TPU_PREFILL_RELAXED_BK", "1") != "0"
        ):
            # full-K ineligible (unfused corr / f32 scales / VMEM cap) —
            # the relaxed-quantum blocked kernel (whole-group scale
            # blocks, gpbh may be < 8) serves prefill instead of raising
            bkp = planar_bk_relaxed(K, g, bk_target) or planar_bk_relaxed(
                K, g, K
            )
        if norm_w is not None and not (use_full or bkp is None):
            x = _rms_norm_rows(x, norm_w[layer], norm_eps)
            norm_w = None
        if use_full or bkp is None:
            if not use_full:
                raise ValueError(
                    f"planar tensor with no admissible k-block (K={K}, g={g})"
                )
            # W4A8 (QLLM_TPU_W4A8=1): per-token symmetric int8 activations
            # feed integer-rate MXU dots — the compute-bound large-batch
            # serving regime (reference role: the int8 activations of
            # csrc/ort_cuda GEMMs). The token scale factors out of the
            # whole contraction and is applied to the kernel output; the
            # in-kernel zs correction runs on x8 sums, so y = sx * (
            # sum_g (x8_g·v_g)·s_g - sum(x8_g)·zs_g) ≈ x·dequant(W).
            # a8 is DECODE-ONLY by default: at prefill the int8 path
            # must dot per group (g-deep contractions — scales vary per
            # group) while the a16 big-dot branch dequantizes once and
            # runs K/2-deep bf16 dots. Measured on v5e at M=512
            # (tools/ab_a8_prefill.py, 2026-08-20): gateup 23.2 vs
            # 172.7 TFLOP/s, down 111.8 vs 147.8 — the integer MXU
            # rate never overcomes the short-contraction penalty, so
            # --w4a8 keeps prefill on W4A16 (the experiment switch
            # QLLM_TPU_QMM_PREFILL_FULLK_A8 re-enables it for sweeps).
            a8 = os.environ.get("QLLM_TPU_W4A8") == "1" and (
                M <= 32
                or os.environ.get("QLLM_TPU_QMM_PREFILL_FULLK_A8") == "1"
            )
            if a8 and norm_w is not None:
                x = _rms_norm_rows(x, norm_w[layer], norm_eps)
                norm_w = None
            if M > 32:
                # PREFILL sizing: the kernel materializes v_lo/v_hi as
                # f32 [K/2, bn] (K*bn*4 bytes total) — at prefill block
                # sizes that alone can blow the ~16 MB scoped VMEM
                # (observed: down-proj K=11008 OOM by 380 KB). Shrink bn
                # first, then size bm from what remains.
                budget = 11 << 20
                while bn > 128 and K * bn * 4 + (K // 8) * bn * 4 > (
                    budget - 64 * K * 2
                ):
                    bn //= 2
                rem = budget - K * bn * 4 - (K // 8) * bn * 4 - bn * 4096
                cap = max(8, rem // (K * 2) // 8 * 8)
                if bm > cap:
                    bm = _pick_block(M, 8, cap)
            G_all = K // g
            grid = (M // bm, N // bn)
            kernel = functools.partial(
                _qmm_kernel_planar_full,
                K=K,
                g=g,
                norm=norm_w is not None,
                eps=norm_eps,
                a8=a8,
            )
            in_specs = [
                pl.BlockSpec(
                    (bm, K), lambda i, j, l: (i, 0), memory_space=pltpu.VMEM
                ),
            ]
            norm_operands = []
            if norm_w is not None:
                # [L, G, g]: per-group rows so the kernel broadcasts a
                # [1, g] slice of a multi-sublane block (a flat [L, K]
                # block is rejected by Mosaic's layout inference)
                in_specs.append(
                    pl.BlockSpec(
                        (1, G_all, g),
                        lambda i, j, l: (l[0], 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                )
                norm_operands = [norm_w.reshape(norm_w.shape[0], G_all, g)]
            in_specs += [
                pl.BlockSpec(
                    (1, K // 8, bn),
                    lambda i, j, l: (l[0], 0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, G_all, bn),
                    lambda i, j, l: (l[0], 0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, G_all, bn),
                    lambda i, j, l: (l[0], 0, j),
                    memory_space=pltpu.VMEM,
                ),
            ]
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (bm, bn), lambda i, j, l: (i, j), memory_space=pltpu.VMEM
                ),
            )
            x_dt = (
                jnp.bfloat16
                if os.environ.get("QLLM_TPU_X_BF16", "1") != "0"
                else jnp.float32
            )
            sx = None
            if a8:
                xf = x.astype(jnp.float32)
                sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1), 1e-8) / 127.0
                x_in = jnp.clip(
                    jnp.round(xf / sx[:, None]), -127, 127
                ).astype(jnp.int8)
            else:
                x_in = x.astype(x_dt)
            out = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                ),
                interpret=jax.default_backend() == "cpu",
            )(
                jnp.asarray([layer], jnp.int32),
                x_in,
                *norm_operands,
                qweight,
                scales,
                zeros,
            )
            if sx is not None:
                out = out * sx[:, None]
            return out.astype(jnp.bfloat16)
        grid = (M // bm, N // bn, K // bkp)
        nk = K // bkp
        gpbh = (bkp // 2) // g
        scales_f = (
            scales
            if scales.dtype == jnp.float32 or fuse_corr
            else scales.astype(jnp.float32)
        )
        # scale/zs stacks as 4D [L, G/gpbh, gpbh, N] (free reshape): the
        # gpbh block dim spans the WHOLE array dim, which exempts it from
        # Mosaic's 8-sublane block quantum — this is what lets the
        # relaxed-quantum prefill path (gpbh as small as 1) compile
        Ls, Nb = scales_f.shape[0], scales_f.shape[-1]
        scales_r = scales_f.reshape(Ls, 2 * nk, gpbh, Nb)
        x_spec = lambda i, j, k, l: (i, k)  # noqa: E731
        x_spec_hi = lambda i, j, k, l: (i, nk + k)  # noqa: E731
        w_spec = lambda i, j, k, l: (l[0], k, j)  # noqa: E731
        s_spec = lambda i, j, k, l: (l[0], k, 0, j)  # noqa: E731
        s_spec_hi = lambda i, j, k, l: (l[0], nk + k, 0, j)  # noqa: E731
        in_specs = [
            pl.BlockSpec((bm, bkp // 2), x_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bkp // 2), x_spec_hi, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, bkp // 8, bn), w_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1, gpbh, bn), s_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, gpbh, bn), s_spec_hi, memory_space=pltpu.VMEM
            ),
        ]
        operands = []
        if fuse_corr:
            kernel = functools.partial(_qmm_kernel_planar_fused, bk=bkp, g=g)
            in_specs += [
                pl.BlockSpec(
                    (1, 1, gpbh, bn), s_spec, memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 1, gpbh, bn), s_spec_hi, memory_space=pltpu.VMEM
                ),
            ]
            zeros_r = zeros.reshape(Ls, 2 * nk, gpbh, Nb)
            operands = [zeros_r, zeros_r]
        else:
            kernel = functools.partial(_qmm_kernel_planar, bk=bkp, g=g)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j, k, l: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        )
        x_dt = (
            jnp.bfloat16
            if os.environ.get("QLLM_TPU_X_BF16", "1") != "0"
            else jnp.float32
        )
        xf32 = x.astype(x_dt)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=jax.default_backend() == "cpu",
        )(
            jnp.asarray([layer], jnp.int32),
            xf32,
            xf32,
            qweight,
            scales_r,
            scales_r,
            *operands,
        )
        if fuse_corr:
            return out.astype(jnp.bfloat16)
        xsum = xf32.astype(jnp.float32).reshape(M, G, g).sum(axis=2)
        zs = (
            zeros[layer]
            if prefolded
            else zeros[layer].astype(jnp.float32) * scales_f[layer]
        )
        corr = jnp.dot(xsum, zs, preferred_element_type=jnp.float32)
        return (out - corr).astype(jnp.bfloat16)

    if bits in (3, 5, 6, 7):
        bko = _choose_bk_odd(K, g, bk_target)
        if bko is None:
            raise ValueError(f"odd-bit kernel: no k-block for K={K}, g={g}")
        # plane-major rows [bits*K/32, N] -> [bits, K/32, N] is a pure
        # reshape (planes are contiguous row blocks)
        qw4 = qweight.reshape(qweight.shape[0], bits, K // 32, -1)
        gpb = bko // g
        seg8 = g // 8
        xq = (
            x.astype(jnp.float32).reshape(M, G, seg8, 8).transpose(3, 1, 0, 2)
        )
        scales_f = (
            scales
            if scales.dtype == jnp.float32 or fuse_corr
            else scales.astype(jnp.float32)
        )
        x_spec = lambda i, j, k, l: (0, k, i, 0)  # noqa: E731
        w4_spec = lambda i, j, k, l: (l[0], 0, k, j)  # noqa: E731
        s_spec = lambda i, j, k, l: (l[0], k, j)  # noqa: E731
        in_specs = [
            pl.BlockSpec(
                (8, gpb, bm, seg8), x_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, bits, bko // 32, bn), w4_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, gpb, bn), s_spec, memory_space=pltpu.VMEM),
        ]
        operands = []
        if fuse_corr:
            if not prefolded:
                raise ValueError("fuse_corr requires prefolded zeros (zs)")
            in_specs.append(
                pl.BlockSpec((1, gpb, bn), s_spec, memory_space=pltpu.VMEM)
            )
            operands = [zeros]
        kernel = functools.partial(
            _qmm_kernel_odd_stacked, bits=bits, bk=bko, g=g, fuse_corr=fuse_corr
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(M // bm, N // bn, K // bko),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j, k, l: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K,
                bytes_accessed=bits * (K // 32) * N * 4 + M * N * 4,
                transcendentals=0,
            ),
            interpret=jax.default_backend() == "cpu",
        )(jnp.asarray([layer], jnp.int32), xq, qw4, scales_f, *operands)
        if fuse_corr:
            return out.astype(jnp.bfloat16)
        xsum = x.astype(jnp.float32).reshape(M, G, g).sum(axis=2)
        zs = (
            zeros[layer]
            if prefolded
            else zeros[layer].astype(jnp.float32) * scales_f[layer]
        )
        corr = jnp.dot(xsum, zs, preferred_element_type=jnp.float32)
        return (out - corr).astype(jnp.bfloat16)

    bk = _choose_bk(K, g, pf, bk_target)
    seg = g // npar
    # W4A8 for the v3/v4 packed family (TP shards, non-planar stacks):
    # per-token int8 activations; token scale + zero-point correction
    # applied outside (the v3 default). See _qmm_kernel_w4a8_v3_stacked.
    a8 = (
        os.environ.get("QLLM_TPU_W4A8") == "1"
        and bits in (2, 4)
        and prefolded
        and not fuse_corr
    )
    sx = None
    if a8:
        xf8 = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf8), axis=1), 1e-8) / 127.0
        x = jnp.clip(jnp.round(xf8 / sx[:, None]), -127, 127).astype(
            jnp.int8
        )
    xq = (
        (x if a8 else x.astype(jnp.float32))
        .reshape(M, G, seg, npar)
        .transpose(3, 1, 0, 2)
    )
    if fuse_corr and not prefolded:
        raise ValueError("fuse_corr requires prefolded zeros (zs)")
    # scales must arrive f32 for the non-fused kernels
    # (stack_layer_params converts once — casting the [L, G, N] stack
    # here would materialize the whole stack EVERY call, profiled at
    # ~25% of decode time). The fused kernel casts per block in VMEM,
    # so bf16 storage is allowed there.
    scales_f = (
        scales
        if scales.dtype == jnp.float32 or fuse_corr
        else scales.astype(jnp.float32)
    )
    grid = (M // bm, N // bn, K // bk)
    x_spec = lambda i, j, k, l: (0, k, i, 0)  # noqa: E731
    w_spec = lambda i, j, k, l: (l[0], k, j)  # noqa: E731
    in_specs = [
        pl.BlockSpec(
            (npar, bk // g, bm, seg), x_spec, memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((1, bk // pf, bn), w_spec, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk // g, bn), w_spec, memory_space=pltpu.VMEM),
    ]
    operands = []
    if fuse_corr:
        kernel = functools.partial(
            _qmm_kernel_v4_stacked, bits=bits, bk=bk, g=g
        )
        in_specs.append(
            pl.BlockSpec((1, bk // g, bn), w_spec, memory_space=pltpu.VMEM)
        )
        operands = [zeros]
    elif a8:
        kernel = functools.partial(
            _qmm_kernel_w4a8_v3_stacked, bits=bits, bk=bk, g=g
        )
    else:
        kernel = functools.partial(
            _qmm_kernel_v3_stacked, bits=bits, bk=bk, g=g, f32_dot=True
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k, l: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=qweight.size // qweight.shape[0] * 4 + M * N * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray([layer], jnp.int32), xq, qweight, scales_f, *operands)
    if fuse_corr:
        return out.astype(jnp.bfloat16)
    # zero-point correction with the selected layer's (z*s) — slice the
    # stack FIRST (multiplying the whole [L, G, N] stack per call was a
    # profiled hot spot)
    xsum = x.astype(jnp.float32).reshape(M, G, g).sum(axis=2)
    zs = (
        zeros[layer]
        if prefolded
        else zeros[layer].astype(jnp.float32) * scales_f[layer]
    )
    corr = jnp.dot(xsum, zs, preferred_element_type=jnp.float32)
    y = out - corr
    if sx is not None:  # a8: undo the per-token activation scale
        y = y * sx[:, None]
    return y.astype(jnp.bfloat16)


def _tuned_blocks(
    K: int, N: int, bits: int, g: int, M: int, planar: bool = True
) -> dict:
    """Autotuned (bn, bk) for this shape as _qmm_2d_stacked kwargs
    (ops.autotune: one-shot cached on-device sweep — the reference's
    custom_autotune.py role done the TPU way). Keys are per kernel
    FAMILY: planar stacks (single-chip serving) vs the v3/v4 packed
    layout (TP shards, which cannot planarize row-sharded K)."""
    from .autotune import lookup

    bn, bk = lookup("stacked" if planar else "stacked_v3", K, N, bits, g, M)
    return {"bn_opt": bn, "bk_opt": bk}


def qmatmul_pallas_stacked(
    x: jax.Array,
    qt_stacked: QuantizedTensor,
    layer: jax.Array,
    norm_w: Optional[jax.Array] = None,
    norm_eps: float = 1e-6,
) -> jax.Array:
    """y = x @ dequant(stack[layer]). qt_stacked leaves carry a leading
    [L] axis (models.stacked). Falls back to slice+qmatmul when the
    no-copy kernel's constraints don't hold.

    ``norm_w`` ([L, K] stacked rms-norm weights): compute
    y = rms_norm(x, norm_w[layer], norm_eps) @ dequant(stack[layer])
    with the norm fused into the matmul kernel when the full-K planar
    path runs (models.stacked.NormedX); any other path normalizes in
    XLA first — numerically the same up to f32-vs-bf16 rounding of the
    weight product."""
    bits = qt_stacked.bits
    K, N = qt_stacked.in_features, qt_stacked.out_features
    N_buf = qt_stacked.qweight.shape[-1]  # may be lane-padded at stack time
    g = K if qt_stacked.group_size == -1 else qt_stacked.group_size
    npar = 8 // bits if bits in (2, 4) else 0
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    # fused in-kernel correction: DEFAULT ON for planar (microbenched
    # faster: no external zs read/dot), OFF for v3 (the per-group outer
    # products measurably slow that layout), FORCED whenever scales are
    # stored bf16 (the external corr path cannot consume bf16 stacks
    # without a full-stack cast)
    bf16_scales = qt_stacked.scales.dtype != jnp.float32
    if qt_stacked.planar:
        # fused planar requires bf16 scale storage on TPU: the f32-scale
        # variant crashes the Mosaic compile helper (observed HTTP 500 /
        # subprocess exit 1); bf16 is the serving default anyway. CPU
        # interpret mode has no such limit.
        fuse_env = (
            qt_stacked.zeros_prefolded
            and (bf16_scales or jax.default_backend() == "cpu")
            and os.environ.get("QLLM_TPU_FUSED_CORR", "1") != "0"
        )
    else:
        fuse_env = qt_stacked.zeros_prefolded and (
            bf16_scales
            or os.environ.get("QLLM_TPU_FUSED_CORR_V3", "0") == "1"
        )
    ok = (
        bits in (2, 3, 4, 5, 6, 7)
        and qt_stacked.perm is None
        # decode (M<=32) for every family; planar 4-bit also serves
        # PREFILL via bm-blocked grids (in-kernel unpack beats the XLA
        # unplanarize fallback by ~45% of prefill wall at T=2048)
        and (M <= 32 or (qt_stacked.planar and bits == 4))
        and (
            jax.default_backend() != "cpu"
            or bool(os.environ.get("QLLM_TPU_FORCE_STACKED_KERNEL"))
        )
    )
    if ok and bits in (3, 5, 6, 7):
        ok = not qt_stacked.planar and odd_stacked_kernel_ok(
            K, qt_stacked.group_size
        )
    elif ok and qt_stacked.planar:
        bn_t = _pick_block(
            N_buf, 128, int(os.environ.get("QLLM_TPU_QMM_BN", "512"))
        )
        full_max = int(os.environ.get("QLLM_TPU_QMM_FULLK_MAX", str(4 << 20)))
        # geometry admissibility only: _qmm_2d_stacked falls back to the
        # largest admissible k-block when the tuned/env target is too small
        ok = planar_bk(K, g, K) is not None or (
            fuse_env
            and planar_full_ok(K, g)
            and (K // 8) * bn_t * 4 <= full_max
        )
        if not ok and M > 32:
            # prefill can also take the relaxed-quantum blocked kernel
            # (whole-group scale blocks) when the 16g quantum rejects
            # the geometry and full-K is ineligible
            ok = (
                planar_bk_relaxed(K, g, K) is not None
                and os.environ.get("QLLM_TPU_PREFILL_RELAXED_BK", "1")
                != "0"
            )
    elif ok:
        ok = (
            _choose_bk(K, g, 32 // bits, 2048) % g == 0
            and (g // npar) % 8 == 0
        )
    if not ok:
        from .ref_matmul import qmatmul

        if norm_w is not None:
            x = _rms_norm_rows(x, norm_w[layer], norm_eps)
        if (
            qt_stacked.planar
            and bits == 4
            and M > 32
            and qt_stacked.perm is None
            and os.environ.get("QLLM_TPU_PREFILL_DEQUANT", "0") == "1"
        ):
            # Direct planar dequant -> dense bf16 dot. MEASURED SLOWER
            # than the generic fallback on v5e (T=2048: 474.7 vs 438.1
            # ms; T=512: 271.6 vs 194.5 — same harness A/B 2026-08-19):
            # XLA materializes the 8x-wide u32 unpack intermediates
            # instead of fusing them into the dot operand. Kept as an
            # env-gated experiment, default OFF; the shipped prefill
            # path is the bm-blocked stacked planar kernel below.
            G_all = K // g
            q32 = qt_stacked.qweight[layer].astype(jnp.uint32)  # [K/8, Nb]
            byte_shift = (jnp.arange(4, dtype=jnp.uint32) * 8)[None, :, None]
            lo = (q32[:, None, :] >> byte_shift) & jnp.uint32(0xF)
            hi = (q32[:, None, :] >> (byte_shift + 4)) & jnp.uint32(0xF)
            vals = jnp.concatenate(
                [lo.reshape(K // 2, N_buf), hi.reshape(K // 2, N_buf)],
                axis=0,
            ).astype(jnp.float32)
            sc_l = qt_stacked.scales[layer].astype(jnp.float32)
            zr_l = qt_stacked.zeros[layer].astype(jnp.float32)
            if not qt_stacked.zeros_prefolded:
                zr_l = zr_l * sc_l
            w_l = (
                vals.reshape(G_all, g, N_buf) * sc_l[:, None, :]
                - zr_l[:, None, :]
            ).reshape(K, N_buf).astype(jnp.bfloat16)
            y = jnp.dot(
                x.reshape(M, K).astype(jnp.bfloat16),
                w_l,
                preferred_element_type=jnp.float32,
            )
            if N_buf != N:
                y = y[:, :N]
            return y.reshape(*lead, N).astype(x.dtype)
        qt = jax.tree_util.tree_map(lambda a: a[layer], qt_stacked)
        import dataclasses as _dc

        if qt_stacked.zeros_prefolded:
            qt = _dc.replace(
                qt, zeros=qt.zeros / qt.scales, zeros_prefolded=False
            )
        if qt_stacked.planar:
            from ..quant.qtensor import unplanarize_packed

            qt = _dc.replace(
                qt, qweight=unplanarize_packed(qt.qweight, K), planar=False
            )
        if N_buf != N:  # strip the lane padding for the generic path
            qt = _dc.replace(
                qt,
                qweight=qt.qweight[:, :N],
                scales=qt.scales[:, :N],
                zeros=qt.zeros[:, :N],
            )
        return qmatmul(x.reshape(*lead, K), qt).reshape(*lead, N)
    x2 = x.reshape(M, K)
    Mp = max(8, ((M + 7) // 8) * 8)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    fuse_corr = fuse_env
    y = _qmm_2d_stacked(
        x2,
        layer,
        qt_stacked.qweight,
        qt_stacked.scales,
        qt_stacked.zeros,
        bits,
        qt_stacked.group_size,
        K,
        N_buf,
        planar=qt_stacked.planar,
        prefolded=qt_stacked.zeros_prefolded,
        fuse_corr=fuse_corr,
        norm_w=norm_w,
        norm_eps=norm_eps,
        **_tuned_blocks(K, N_buf, bits, g, M, planar=qt_stacked.planar),
    )
    if Mp != M:
        y = y[:M]
    if N_buf != N:
        y = y[:, :N]
    return y.reshape(*lead, N).astype(x.dtype)


def qmatmul_pallas(x: jax.Array, qt: QuantizedTensor) -> jax.Array:
    """y = x @ dequant(qt). x: [..., K] (perm already applied by caller)."""
    if qt.bits not in (2, 4, 8):
        raise NotImplementedError(f"pallas path supports 2/4/8 bits, got {qt.bits}")
    K, N = qt.in_features, qt.out_features
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    Mp = max(8, ((M + 7) // 8) * 8)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    y = _qmm_2d(
        x2,
        qt.qweight,
        qt.scales,
        qt.zeros,
        qt.bits,
        qt.group_size,
        K,
        N,
    )
    if Mp != M:
        y = y[:M]
    return y.reshape(*lead, N).astype(x.dtype)


# --------------------------------------------------------------------------
# Grouped expert GEMV: the TPU-native analog of megablocked MoE GEMMs.
# One kernel launch evaluates EVERY (token, expert) selection of a
# sparse-MoE block — grid (n_sel, N/bn) with each row's expert index
# delivered by scalar prefetch straight into the weight index maps, so
# the kernel streams only the selected experts' packed blocks and no
# weight gather is ever materialized. Replaces n_sel separate
# qmatmul_pallas_stacked launches (launch overhead scales with S*k*3
# per MoE layer otherwise — prohibitive for batched decode and for
# big-E families like deepseek/qwen-moe).
# --------------------------------------------------------------------------


def grouped_experts_ok(qt_stacked: QuantizedTensor) -> bool:
    """Eligibility for qmatmul_grouped_experts (mirrors the fused
    full-K planar constraints; callers fall back to per-selection
    indexed calls otherwise)."""
    K = qt_stacked.in_features
    g = K if qt_stacked.group_size == -1 else qt_stacked.group_size
    if not (
        qt_stacked.bits == 4
        and qt_stacked.planar
        and qt_stacked.zeros_prefolded
        and qt_stacked.perm is None
        and planar_full_ok(K, g)
    ):
        return False
    if jax.default_backend() == "cpu":
        # same convention as the stacked kernel: interpret-mode runs
        # only when forced (tests); the default CPU path stays on the
        # exact per-selection fallback
        if not os.environ.get("QLLM_TPU_FORCE_STACKED_KERNEL"):
            return False
    elif qt_stacked.scales.dtype == jnp.float32:
        # f32-scale planar + fused correction crashes the Mosaic
        # compile helper on TPU (see qmatmul_pallas_stacked)
        return False
    N_buf = qt_stacked.qweight.shape[-1]
    bn = _grouped_bn(K, N_buf)
    full_max = int(os.environ.get("QLLM_TPU_QMM_FULLK_MAX", str(4 << 20)))
    return (K // 8) * bn * 4 <= full_max


def _grouped_bn(K: int, N_buf: int) -> int:
    """Grouped-kernel n-block: as WIDE as the VMEM cap admits (small
    per-expert widths otherwise stream tiny blocks — qwen3-moe's
    [1, 96, 512] gate blocks measured well under the wide-block rate).
    Env QLLM_TPU_QMM_GROUPED_BN overrides."""
    env = int(os.environ.get("QLLM_TPU_QMM_GROUPED_BN", "0"))
    if env:
        return _pick_block(N_buf, 128, env)
    full_max = int(os.environ.get("QLLM_TPU_QMM_FULLK_MAX", str(4 << 20)))
    cap = max(128, full_max // ((K // 8) * 4))
    return _pick_block(N_buf, 128, min(2048, cap))


def qmatmul_grouped_experts(
    x_rows: jax.Array,  # [n, K] — one activation row per selection
    qt_stacked: QuantizedTensor,  # [E]-stacked planar serving prep
    expert_ids: jax.Array,  # [n] int32 (traced)
    x_shared: bool = False,  # every selection reads x_rows[0] (B=1)
) -> jax.Array:  # [n, N] bf16
    """y[i] = x_rows[i] @ dequant(stack[expert_ids[i]]) — all
    selections in ONE pallas_call (see module comment above).

    ``x_shared``: B=1 decode repeats ONE activation row across its k
    selections; the kernel then reads a single [8, K] x block for the
    whole launch instead of a padded [8n, K] copy (skips the pad
    materialization and the per-step x refetch)."""
    K, N = qt_stacked.in_features, qt_stacked.out_features
    N_buf = qt_stacked.qweight.shape[-1]
    g = K if qt_stacked.group_size == -1 else qt_stacked.group_size
    G_all = K // g
    n = x_rows.shape[0]
    bn = _grouped_bn(K, N_buf)
    kernel = functools.partial(
        _qmm_kernel_planar_full, K=K, g=g, norm=False, a8=False
    )
    # Selection index i is the MINOR grid dim: the weight index map
    # depends only on (ids[i], j), and Pallas skips an operand's copy
    # when consecutive grid steps map to the same block — so selections
    # pre-sorted by expert id (models.llama._moe_sparse) stream each
    # touched expert's bytes once per j-block, not once per selection.
    grid = (N_buf // bn, n)
    # Mosaic needs an 8-divisible sublane block: give every selection an
    # 8-row x block (its row + 7 zeros). The MXU pads sub-8-row operands
    # to 8 sublanes anyway, so the extra rows cost nothing; rows 1..7 of
    # each output block are discarded below.
    if x_shared:
        x8 = jnp.pad(x_rows[:1], ((0, 7), (0, 0)))  # one [8, K] block
        x_map = lambda j, i, ids: (0, 0)  # noqa: E731
    else:
        x8 = jnp.pad(x_rows[:, None, :], ((0, 0), (0, 7), (0, 0))).reshape(
            8 * n, K
        )
        x_map = lambda j, i, ids: (i, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((8, K), x_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, K // 8, bn),
            lambda j, i, ids: (ids[i], 0, j),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, G_all, bn),
            lambda j, i, ids: (ids[i], 0, j),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, G_all, bn),
            lambda j, i, ids: (ids[i], 0, j),
            memory_space=pltpu.VMEM,
        ),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (8, bn), lambda j, i, ids: (i, j), memory_space=pltpu.VMEM
        ),
    )
    x_dt = (
        jnp.bfloat16
        if os.environ.get("QLLM_TPU_X_BF16", "1") != "0"
        else jnp.float32
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8 * n, N_buf), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        expert_ids.astype(jnp.int32),
        x8.astype(x_dt),
        qt_stacked.qweight,
        qt_stacked.scales,
        qt_stacked.zeros,
    )
    out = out.reshape(n, 8, N_buf)[:, 0]
    if N_buf != N:
        out = out[:, :N]
    return out.astype(jnp.bfloat16)


# --------------------------------------------------------------------------
# Fused proj -> residual+rmsnorm -> proj (decode): o_proj and gateup in
# ONE launch. The width-ceiling experiment (tools/ab_width_ceiling.py,
# v5e 2026-08-20) showed the o kernel is pipeline-FILL bound: its 8
# n-blocks stream at ~587 GB/s alone but ~674 GB/s when the same bytes
# ride a 4x-wider launch. Every op between o and gateup is serially
# dependent, so the only aggregation that respects the dataflow is a
# single kernel whose grid runs o's blocks first and gateup's after —
# gateup's weight stream prefetches during o's compute, and o's drain
# is amortized into a 52-step pipeline instead of 8. The residual add
# + rmsnorm live in VMEM between the phases (VPU work hidden under the
# weight stream, same as the fused-norm kernel).
# --------------------------------------------------------------------------


def _qmm_kernel_pnp(
    layer_ref,  # scalar prefetch [1]
    x1_ref,  # [M, K1] bf16/f32 — proj1 input (attention context)
    h_ref,  # [M, D] residual stream
    nw_ref,  # [1, D/g2, g2] rms-norm weight rows (post_attention_ln)
    qw1_ref,  # [1, K1/8, bn1] planar u32 (proj1 block)
    s1_ref,  # [1, G1, bn1]
    z1_ref,  # [1, G1, bn1] prefolded zs
    qw2_ref,  # [1, K2/8, bn2] (proj2 block)
    s2_ref,  # [1, G2, bn2]
    z2_ref,  # [1, G2, bn2]
    y2_ref,  # out [M, bn2]
    hn_ref,  # out [M, D] (h + proj1(x1)) — the next residual
    hn_scr,  # scratch [M, D] f32
    *,
    K1: int,
    K2: int,
    g1: int,
    g2: int,
    n1: int,
    eps: float,
):
    del layer_ref
    s = pl.program_id(0)
    M = x1_ref.shape[0]

    def fullk(xv, qw_ref, s_ref, z_ref, K, g, out_w):
        """Full-K per-group matmul with fused zs correction (the
        _qmm_kernel_planar_full decode loop)."""
        Gh = (K // 2) // g
        qw = pltpu.bitcast(qw_ref[0], jnp.int32)
        v_lo = pltpu.bitcast(qw & jnp.int32(0x0F0F0F0F), jnp.int8).astype(
            jnp.float32
        )
        v_hi = pltpu.bitcast(
            jax.lax.shift_right_logical(qw, jnp.int32(4))
            & jnp.int32(0x0F0F0F0F),
            jnp.int8,
        ).astype(jnp.float32)
        sc = s_ref[0].astype(jnp.float32)
        zs = z_ref[0].astype(jnp.float32)
        acc = jnp.zeros((M, out_w), jnp.float32)
        for half, v in ((0, v_lo), (1, v_hi)):
            base = half * Gh
            off = half * (K // 2)
            for gi in range(Gh):
                xg = xv[:, off + gi * g : off + (gi + 1) * g]
                d = jnp.dot(
                    xg,
                    v[gi * g : (gi + 1) * g],
                    preferred_element_type=jnp.float32,
                )
                xsum = jnp.sum(xg, axis=1, keepdims=True)
                acc = (
                    acc
                    + d * sc[base + gi : base + gi + 1, :]
                    - xsum * zs[base + gi : base + gi + 1, :]
                )
        return acc

    # phase 1: proj1 block j -> static slice of the hn scratch
    # (static unroll: dynamic lane-offset scratch stores are what
    # Mosaic rejects; n1 is small — 8 for o at bn=512)
    bn1 = qw1_ref.shape[-1]
    x1v = x1_ref[:, :].astype(jnp.float32)
    for j in range(n1):

        @pl.when(s == j)
        def _(j=j):
            hn_scr[:, j * bn1 : (j + 1) * bn1] = fullk(
                x1v, qw1_ref, s1_ref, z1_ref, K1, g1, bn1
            )

    # phase boundary: residual add, emit hn, keep it in scratch for the
    # per-group normalized reads below
    @pl.when(s == n1)
    def _():
        hn = hn_scr[:, :] + h_ref[:, :].astype(jnp.float32)
        hn_scr[:, :] = hn
        hn_ref[:, :] = hn.astype(hn_ref.dtype)

    # phase 2: proj2 block (s - n1) on rmsnorm(hn) — the norm is
    # recomputed per block from scratch (VPU cost hidden under the
    # weight stream, exactly like the fused-norm decode kernel)
    @pl.when(s >= n1)
    def _():
        hn = hn_scr[:, :]
        var = jnp.sum(hn * hn, axis=1, keepdims=True) * float(1.0 / K2)
        rstd = jax.lax.rsqrt(var + float(eps))
        Gh2 = (K2 // 2) // g2
        nw = nw_ref[0].astype(jnp.float32)  # [D/g2, g2]
        qw = pltpu.bitcast(qw2_ref[0], jnp.int32)
        v_lo = pltpu.bitcast(qw & jnp.int32(0x0F0F0F0F), jnp.int8).astype(
            jnp.float32
        )
        v_hi = pltpu.bitcast(
            jax.lax.shift_right_logical(qw, jnp.int32(4))
            & jnp.int32(0x0F0F0F0F),
            jnp.int8,
        ).astype(jnp.float32)
        sc = s2_ref[0].astype(jnp.float32)
        zs = z2_ref[0].astype(jnp.float32)
        acc = jnp.zeros(y2_ref.shape, jnp.float32)
        for half, v in ((0, v_lo), (1, v_hi)):
            base = half * Gh2
            off = half * (K2 // 2)
            for gi in range(Gh2):
                gabs = (off + gi * g2) // g2
                xg = (
                    hn[:, off + gi * g2 : off + (gi + 1) * g2]
                    * rstd
                    * nw[gabs : gabs + 1, :]
                )
                d = jnp.dot(
                    xg,
                    v[gi * g2 : (gi + 1) * g2],
                    preferred_element_type=jnp.float32,
                )
                xsum = jnp.sum(xg, axis=1, keepdims=True)
                acc = (
                    acc
                    + d * sc[base + gi : base + gi + 1, :]
                    - xsum * zs[base + gi : base + gi + 1, :]
                )
        y2_ref[:, :] = acc


def pnp_stacked_ok(qt1: QuantizedTensor, qt2: QuantizedTensor) -> bool:
    """Eligibility for qmatmul_pnp_stacked: both stacks planar 4-bit,
    prefolded, bf16 scales (TPU Mosaic constraint), full-K admissible,
    proj1's out width unpadded and equal to proj2's in width."""
    for qt in (qt1, qt2):
        g = qt.in_features if qt.group_size == -1 else qt.group_size
        if not (
            qt.bits == 4
            and qt.planar
            and qt.zeros_prefolded
            and qt.perm is None
            and planar_full_ok(qt.in_features, g)
        ):
            return False
        if (
            qt.scales.dtype == jnp.float32
            and jax.default_backend() != "cpu"
        ):
            return False
    if qt1.qweight.shape[-1] != qt1.out_features:
        return False  # padded proj1 columns would corrupt the residual
    if qt1.out_features != qt2.in_features:
        return False
    full_max = int(os.environ.get("QLLM_TPU_QMM_FULLK_MAX", str(4 << 20)))
    bn = int(os.environ.get("QLLM_TPU_QMM_BN", "512"))
    return (
        (qt1.in_features // 8) * min(bn, qt1.out_features) * 4 <= full_max
        and (qt2.in_features // 8) * min(bn, qt2.qweight.shape[-1]) * 4
        <= full_max
    )


def qmatmul_pnp_stacked(
    x1: jax.Array,  # [M, K1]
    h: jax.Array,  # [M, D]
    qt1: QuantizedTensor,  # [L]-stacked proj1 (o_proj)
    qt2: QuantizedTensor,  # [L]-stacked proj2 (gateup)
    norm_w: jax.Array,  # [L, D] rms-norm weights
    layer: jax.Array,
    eps: float,
):
    """(h + x1 @ W1[layer], rmsnorm(h + x1 @ W1) @ W2[layer]) in ONE
    launch — see the module comment above. Returns (hn [M, D],
    y2 [M, N2])."""
    K1, D = qt1.in_features, qt1.out_features
    K2, N2 = qt2.in_features, qt2.out_features
    N2_buf = qt2.qweight.shape[-1]
    g1 = K1 if qt1.group_size == -1 else qt1.group_size
    g2 = K2 if qt2.group_size == -1 else qt2.group_size
    M = x1.shape[0]
    bn = int(os.environ.get("QLLM_TPU_QMM_BN", "512"))
    bn1 = _pick_block(D, 128, bn)
    bn2 = _pick_block(N2_buf, 128, bn)
    n1, n2 = D // bn1, N2_buf // bn2
    G1, G2 = K1 // g1, K2 // g2
    kernel = functools.partial(
        _qmm_kernel_pnp, K1=K1, K2=K2, g1=g1, g2=g2, n1=n1, eps=eps
    )
    grid = (n1 + n2,)
    c = lambda f: f  # noqa: E731  (readability below)
    in_specs = [
        pl.BlockSpec((M, K1), lambda s, l: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((M, D), lambda s, l: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, D // g2, g2), lambda s, l: (l[0], 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, K1 // 8, bn1),
            lambda s, l: (l[0], 0, jnp.minimum(s, n1 - 1)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, G1, bn1),
            lambda s, l: (l[0], 0, jnp.minimum(s, n1 - 1)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, G1, bn1),
            lambda s, l: (l[0], 0, jnp.minimum(s, n1 - 1)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, K2 // 8, bn2),
            lambda s, l: (l[0], 0, jnp.clip(s - n1, 0, n2 - 1)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, G2, bn2),
            lambda s, l: (l[0], 0, jnp.clip(s - n1, 0, n2 - 1)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, G2, bn2),
            lambda s, l: (l[0], 0, jnp.clip(s - n1, 0, n2 - 1)),
            memory_space=pltpu.VMEM,
        ),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (M, bn2),
                lambda s, l: (0, jnp.clip(s - n1, 0, n2 - 1)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (M, D), lambda s, l: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[pltpu.VMEM((M, D), jnp.float32)],
    )
    x_dt = (
        jnp.bfloat16
        if os.environ.get("QLLM_TPU_X_BF16", "1") != "0"
        else jnp.float32
    )
    y2, hn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((M, N2_buf), jnp.float32),
            jax.ShapeDtypeStruct((M, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        jnp.asarray([layer], jnp.int32),
        x1.astype(x_dt),
        h.astype(jnp.float32),
        norm_w.reshape(norm_w.shape[0], D // g2, g2),
        qt1.qweight,
        qt1.scales,
        qt1.zeros,
        qt2.qweight,
        qt2.scales,
        qt2.zeros,
    )
    if N2_buf != N2:
        y2 = y2[:, :N2]
    return hn, y2.astype(jnp.bfloat16)


# --------------------------------------------------------------------------
# Fused grouped expert MLP (decode): gateup -> act -> down in ONE launch.
#
# The 2-launch grouped path pays a pipeline fill per launch; at small
# per-expert widths (qwen3-moe I=768: 2.4 MB/expert) the fill is a
# visible fraction of the stream (experts profiled at 84% of the
# measured ceiling). Phases run per SELECTION: the down weight block's
# index map clamps to block 0 during the gateup phases, so its first
# block prefetches under gateup compute, and the activation never
# round-trips HBM. B=1-decode-only: phase-minor ordering re-walks the
# expert's blocks per selection, which would forfeit the sorted-dedup
# copy-skip batched decode relies on (models.llama._moe_sparse).
# --------------------------------------------------------------------------


def _qmm_kernel_grouped_fused(
    ids_ref,  # scalar prefetch [n]
    x_ref,  # [8, K1] bf16/f32 (selection's row + 7 zero rows)
    gqw_ref,  # [1, K1/8, K2] planar u32 (gate block, then up block)
    gs_ref,  # [1, G1, K2]
    gz_ref,  # [1, G1, K2] prefolded zs
    dqw_ref,  # [1, K2/8, bn2] (down block)
    ds_ref,  # [1, G2, bn2]
    dz_ref,  # [1, G2, bn2]
    o_ref,  # out [8, bn2] f32
    act_scr,  # scratch [8, K2] f32
    *,
    K1: int,
    K2: int,
    g: int,
    act: str,
):
    del ids_ref
    p = pl.program_id(1)
    M = x_ref.shape[0]

    def fullk(xv, qw_ref, s_ref, z_ref, K, out_w):
        Gh = (K // 2) // g
        qw = pltpu.bitcast(qw_ref[0], jnp.int32)
        v_lo = pltpu.bitcast(qw & jnp.int32(0x0F0F0F0F), jnp.int8).astype(
            jnp.float32
        )
        v_hi = pltpu.bitcast(
            jax.lax.shift_right_logical(qw, jnp.int32(4))
            & jnp.int32(0x0F0F0F0F),
            jnp.int8,
        ).astype(jnp.float32)
        sc = s_ref[0].astype(jnp.float32)
        zs = z_ref[0].astype(jnp.float32)
        acc = jnp.zeros((M, out_w), jnp.float32)
        for half, v in ((0, v_lo), (1, v_hi)):
            base = half * Gh
            off = half * (K // 2)
            for gi in range(Gh):
                xg = xv[:, off + gi * g : off + (gi + 1) * g]
                d = jnp.dot(
                    xg,
                    v[gi * g : (gi + 1) * g],
                    preferred_element_type=jnp.float32,
                )
                xsum = jnp.sum(xg, axis=1, keepdims=True)
                acc = (
                    acc
                    + d * sc[base + gi : base + gi + 1, :]
                    - xsum * zs[base + gi : base + gi + 1, :]
                )
        return acc

    @pl.when(p == 0)  # gate half
    def _():
        act_scr[...] = fullk(
            x_ref[:].astype(jnp.float32), gqw_ref, gs_ref, gz_ref, K1, K2
        )

    @pl.when(p == 1)  # up half; apply the gate activation
    def _():
        up = fullk(
            x_ref[:].astype(jnp.float32), gqw_ref, gs_ref, gz_ref, K1, K2
        )
        gt = act_scr[...]
        if act == "gelu":
            a = (
                0.5
                * gt
                * (
                    1.0
                    + jnp.tanh(0.7978845608 * (gt + 0.044715 * gt * gt * gt))
                )
            )
        else:  # silu
            a = gt * jax.lax.logistic(gt)
        act_scr[...] = a * up

    @pl.when(p >= 2)  # down blocks
    def _():
        o_ref[...] = fullk(act_scr[...], dqw_ref, ds_ref, dz_ref, K2, o_ref.shape[-1])


def grouped_fused_ok(
    gu: QuantizedTensor, dn: QuantizedTensor, n: int, act: str
) -> bool:
    """Eligibility for qmatmul_grouped_experts_fused: B=1-scale
    selection counts, silu/gelu gate, small-I experts (the full-K
    dequant planes for both matmuls must fit VMEM), matching planar
    serving preps."""
    K1, K2 = gu.in_features, dn.in_features
    if act not in ("silu", "gelu"):
        return False
    if n > 16 or gu.out_features != 2 * K2 or K2 > 1024:
        return False
    if gu.qweight.shape[-1] % K2:
        return False  # bn1 = K2 must tile the (possibly padded) buffer
    g1 = K1 if gu.group_size == -1 else gu.group_size
    g2 = K2 if dn.group_size == -1 else dn.group_size
    if g1 != g2:
        return False
    for qt, K in ((gu, K1), (dn, K2)):
        if not (
            qt.bits == 4
            and qt.planar
            and qt.zeros_prefolded
            and qt.perm is None
            and planar_full_ok(K, g1)
        ):
            return False
    if jax.default_backend() == "cpu":
        if not os.environ.get("QLLM_TPU_FORCE_STACKED_KERNEL"):
            return False
    elif gu.scales.dtype == jnp.float32 or dn.scales.dtype == jnp.float32:
        return False
    # MEASURED NEGATIVE, default OFF: on v5e at the qwen3-moe geometry
    # (K1=2048, I=768, n=8) the fused launch ran 40.4 us/block vs the
    # 2-launch grouped path's 32.6 (615 GB/s) — the per-selection phase
    # walk's wide gate/up blocks stream worse than the selection-minor
    # 2-launch pattern, the same verdict as the dense pnp fusion
    # (reports/ceiling_r4.md). Kept parity-tested as an A/B lever.
    return os.environ.get("QLLM_TPU_MOE_FUSED", "0") == "1"


def qmatmul_grouped_experts_fused(
    x_rows: jax.Array,  # [n, K1]
    gu_stacked: QuantizedTensor,  # [E]-stacked fused gate|up prep
    dn_stacked: QuantizedTensor,  # [E]-stacked down prep
    expert_ids: jax.Array,  # [n] int32 (traced)
    act: str = "silu",
) -> jax.Array:  # [n, N2] bf16
    """y[i] = act_fn(x[i] @ GU[ids[i]]) @ DN[ids[i]] — the whole expert
    MLP for every selection in ONE pallas_call."""
    K1, K2 = gu_stacked.in_features, dn_stacked.in_features
    N2 = dn_stacked.out_features
    N2_buf = dn_stacked.qweight.shape[-1]
    g = K1 if gu_stacked.group_size == -1 else gu_stacked.group_size
    G1, G2 = K1 // g, K2 // g
    n = x_rows.shape[0]
    bn2 = _grouped_bn(K2, N2_buf)
    n2 = N2_buf // bn2
    x8 = jnp.pad(x_rows[:, None, :], ((0, 0), (0, 7), (0, 0))).reshape(
        8 * n, K1
    )
    in_specs = [
        pl.BlockSpec(
            (8, K1), lambda i, p, ids: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, K1 // 8, K2),
            lambda i, p, ids: (ids[i], 0, jnp.minimum(p, 1)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, G1, K2),
            lambda i, p, ids: (ids[i], 0, jnp.minimum(p, 1)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, G1, K2),
            lambda i, p, ids: (ids[i], 0, jnp.minimum(p, 1)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, K2 // 8, bn2),
            lambda i, p, ids: (ids[i], 0, jnp.maximum(p - 2, 0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, G2, bn2),
            lambda i, p, ids: (ids[i], 0, jnp.maximum(p - 2, 0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, G2, bn2),
            lambda i, p, ids: (ids[i], 0, jnp.maximum(p - 2, 0)),
            memory_space=pltpu.VMEM,
        ),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, 2 + n2),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (8, bn2),
            lambda i, p, ids: (i, jnp.maximum(p - 2, 0)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((8, K2), jnp.float32)],
    )
    x_dt = (
        jnp.bfloat16
        if os.environ.get("QLLM_TPU_X_BF16", "1") != "0"
        else jnp.float32
    )
    out = pl.pallas_call(
        functools.partial(
            _qmm_kernel_grouped_fused, K1=K1, K2=K2, g=g, act=act
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8 * n, N2_buf), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        expert_ids.astype(jnp.int32),
        x8.astype(x_dt),
        gu_stacked.qweight,
        gu_stacked.scales,
        gu_stacked.zeros,
        dn_stacked.qweight,
        dn_stacked.scales,
        dn_stacked.zeros,
    )
    out = out.reshape(n, 8, N2_buf)[:, 0]
    if N2_buf != N2:
        out = out[:, :N2]
    return out.astype(jnp.bfloat16)
