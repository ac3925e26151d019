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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "decode_attention_pallas",
    "prefill_attention_flash",
    "decode_attention_ring",
    "kv_ring_flush_pallas",
]


def _attn_kernel(
    lengths_ref,  # scalar prefetch: [B] int32 valid lengths
    win_ref,  # scalar prefetch: [1] int32 sliding window (S+1 = off)
    q_ref,  # [1, hb, n_rep_p, d] bf16 (pre-scaled by 1/sqrt(d))
    k_ref,  # [1, hb, S, d] int8
    v_ref,  # [1, hb, S, d] int8
    ks_ref,  # [1, hb, 1, S] f32
    vs_ref,  # [1, hb, 1, S] f32
    *refs,  # ([bias_ref [1, hb, n_rep_p, S] when alibi]), o_ref
    softcap: float = 0.0,
    alibi: bool = False,
):
    if alibi:
        bias_ref, o_ref = refs
    else:
        (o_ref,) = refs
    b = pl.program_id(0)
    hb = k_ref.shape[1]
    length = lengths_ref[b]
    win = win_ref[0]
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
        if softcap:
            # gemma2 attn_logit_softcapping: cap*tanh(logits/cap),
            # applied to the TRUE logits (after the int8-K scale fold),
            # BEFORE the length mask — HF eager semantics
            scores = softcap * jnp.tanh(scores * (1.0 / softcap))
        if alibi:
            # bloom/mpt positional bias, key-position form slopes[h]*s
            # (build_mask's row-constant-free equivalent)
            scores = scores + bias_ref[0, h]
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        # sliding window (mistral/qwen2/gemma2 local layers): the query
        # at pos length-1 sees keys s with length-1 - s < win, i.e.
        # s >= length - win; global layers pass win = S+1 (no-op)
        ok = (col < length) & (col >= length - win)
        scores = jnp.where(ok, scores, -jnp.inf)

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
    win_ref,  # scalar prefetch: [1] int32 sliding window (S+1 = off)
    q_ref,  # [1, hb, n_rep_p, d]
    k_ref,  # [1, 1, hb, S, d] int8 (layer-selected block)
    v_ref,
    ks_ref,  # [1, 1, hb, 1, S]
    vs_ref,
    *refs,  # ([bias_ref [1, hb, n_rep_p, S] when alibi]), o_ref
    softcap: float = 0.0,
    alibi: bool = False,
):
    del layer_ref

    class _V:
        def __init__(self, ref):
            self.ref = ref
            self.shape = ref.shape[1:]

        def __getitem__(self, idx):
            return self.ref[0][idx]

    _attn_kernel(
        lengths_ref,
        win_ref,
        q_ref,
        _V(k_ref),
        _V(v_ref),
        _V(ks_ref),
        _V(vs_ref),
        *refs,
        softcap=softcap,
        alibi=alibi,
    )


def _kv_write_kernel(
    layer_ref,  # scalar prefetch: [1]
    pos_ref,  # scalar prefetch: [B] write positions
    kn_ref,  # [1, hb, 1, d] f32 — this step's k (post-rope)
    vn_ref,  # [1, hb, 1, d] f32
    kw_ref,  # [1, 1, hb, 8, d] int8 — 8-row cache window containing pos
    vw_ref,
    ksw_ref,  # [1, 1, hb, 1, S] f32 scale row
    vsw_ref,
    ko_ref,  # aliased outputs (window / scale row rewritten)
    vo_ref,
    kso_ref,
    vso_ref,
):
    """Quantize + insert ONE token into the int8 KV cache in-place.

    Replaces cache.update's dynamic_update_slices (which made the scan
    double-buffer the whole cache, ~0.5 ms/token on 7B): the kernel's
    only cache-sized operands are an 8-row aligned window and the [1,S]
    scale row, each input_output_aliased — the full cache buffer is
    NEVER passed to a second (read) operand of the same call, so XLA
    keeps it in place (a first fused-attention design read the full
    cache AND donated it in one pallas_call; XLA inserted a whole-cache
    copy per layer — 2 GB/token on 7B, measured 62 vs 132 tok/s).
    Mosaic needs >=8-sublane windows; the new row is selected into the
    window with a static-shape where()."""
    b = pl.program_id(0)
    pos = pos_ref[b]
    hb = kw_ref.shape[2]
    row = pos % 8
    S = ksw_ref.shape[-1]
    for h in range(hb):
        kn = kn_ref[0, h]  # [1, d] f32
        vn = vn_ref[0, h]
        ksc = jnp.maximum(jnp.max(jnp.abs(kn)) / 127.0, 1e-8)
        k8 = jnp.clip(jnp.round(kn / ksc), -127, 127).astype(jnp.int8)
        vsc = jnp.maximum(jnp.max(jnp.abs(vn)) / 127.0, 1e-8)
        v8 = jnp.clip(jnp.round(vn / vsc), -127, 127).astype(jnp.int8)
        d = kn.shape[-1]
        rsel = jax.lax.broadcasted_iota(jnp.int32, (8, d), 0) == row
        ko_ref[0, 0, h] = jnp.where(
            rsel, jnp.broadcast_to(k8, (8, d)), kw_ref[0, 0, h]
        )
        vo_ref[0, 0, h] = jnp.where(
            rsel, jnp.broadcast_to(v8, (8, d)), vw_ref[0, 0, h]
        )
        csel = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1) == pos
        kso_ref[0, 0, h] = jnp.where(csel, ksc, ksw_ref[0, 0, h])
        vso_ref[0, 0, h] = jnp.where(csel, vsc, vsw_ref[0, 0, h])


@functools.partial(jax.jit, static_argnames=())
def kv_cache_write_pallas(
    k_new: jax.Array,  # [B, H_kv, d] this step's k (post-rope)
    v_new: jax.Array,  # [B, H_kv, d]
    k_cache: jax.Array,  # [L, B, H_kv, S, d] int8
    v_cache: jax.Array,
    k_scale: jax.Array,  # [L, B, H_kv, S] f32
    v_scale: jax.Array,
    layer: jax.Array,  # scalar int32
    pos: jax.Array,  # [B] int32 write positions
):
    """Returns (k_cache', v_cache', k_scale', v_scale') with the new
    token quantized + written in place (buffer-aliased window writes).
    Pair with decode_attention_pallas, which then reads the updated
    cache — together they form the fused-decode path the reference's
    ft_attention promised (SURVEY §2.2) without any cache copy."""
    B, Hkv, d = k_new.shape
    L, _, _, S, _ = k_cache.shape
    kn = k_new.reshape(B, Hkv, 1, d).astype(jnp.float32)
    vn = v_new.reshape(B, Hkv, 1, d).astype(jnp.float32)
    ks5 = k_scale.reshape(L, B, Hkv, 1, S)
    vs5 = v_scale.reshape(L, B, Hkv, 1, S)

    hb = 1
    for cand in (8, 4, 2):
        if Hkv % cand == 0:
            hb = cand
            break

    bh_spec = lambda b, h, *_: (b, h, 0, 0)  # noqa: E731
    win_spec = lambda b, h, l, p: (l[0], b, h, p[b] // 8, 0)  # noqa: E731
    row_spec = lambda b, h, l, p: (l[0], b, h, 0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv // hb),
        in_specs=[
            pl.BlockSpec((1, hb, 1, d), bh_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, 1, d), bh_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, hb, 8, d), win_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, 8, d), win_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, 1, S), row_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, 1, S), row_spec, memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, hb, 8, d), win_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, 8, d), win_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, 1, S), row_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, 1, S), row_spec, memory_space=pltpu.VMEM
            ),
        ],
    )
    k2, v2, ks2, vs2 = pl.pallas_call(
        _kv_write_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(ks5.shape, jnp.float32),
            jax.ShapeDtypeStruct(vs5.shape, jnp.float32),
        ],
        # indices count the scalar-prefetch operands (layer, pos)
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
        interpret=jax.default_backend() == "cpu",
    )(
        jnp.asarray([layer], jnp.int32).reshape(1),
        pos.astype(jnp.int32),
        kn,
        vn,
        k_cache,
        v_cache,
        ks5,
        vs5,
    )
    return (
        k2,
        v2,
        ks2.reshape(L, B, Hkv, S),
        vs2.reshape(L, B, Hkv, S),
    )


_NEG = -1e30  # mask value: -inf would NaN the online-softmax rescale


def _attn_kernel_stacked_chunked(
    lengths_ref,  # scalar prefetch: [B]
    layer_ref,  # scalar prefetch: [1]
    win_ref,  # scalar prefetch: [1] sliding window (S+1 = off)
    q_ref,  # [1, hb, n_rep_p, d] bf16 (pre-scaled)
    k_ref,  # [1, 1, hb, bs, d] int8 — this chunk of the cache
    v_ref,
    ks_ref,  # [1, 1, hb, 1, bs] f32
    vs_ref,
    o_ref,  # [1, hb, n_rep_p, d]
    m_ref,  # scratch [hb, n_rep_p, 1] running max
    den_ref,  # scratch [hb, n_rep_p, 1]
    acc_ref,  # scratch [hb, n_rep_p, d]
    *,
    bs: int,
    softcap: float = 0.0,
):
    """Flash-style decode attention: the sequence axis is a grid
    dimension with online-softmax state in scratch — the long-context
    path (a one-shot [S, d] block stops fitting VMEM around 16k; this
    kernel streams the cache in ``bs`` chunks at any S). Same int8-KV
    scale folding as _attn_kernel."""
    del layer_ref
    b = pl.program_id(0)
    s = pl.program_id(2)
    ns = pl.num_programs(2)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        den_ref[:] = jnp.zeros_like(den_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    length = lengths_ref[b]
    win = win_ref[0]
    base = s * bs

    # whole-chunk skip: a sliding window means only the chunks
    # intersecting [length - win, length) contribute — on a 32k-context
    # mistral decode that is 4k of cache read instead of 32k
    @pl.when((base < length) & (base + bs > length - win))
    def _():
        hb = k_ref.shape[2]
        for h in range(hb):
            q = q_ref[0, h]  # [n_rep_p, d]
            k = k_ref[0, 0, h].astype(jnp.bfloat16)  # [bs, d]
            ks = ks_ref[0, 0, h]  # [1, bs]
            scores = (
                jax.lax.dot_general(
                    q,
                    k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * ks
            )
            if softcap:
                scores = softcap * jnp.tanh(scores * (1.0 / softcap))
            col = base + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 1
            )
            ok = (col < length) & (col >= length - win)
            scores = jnp.where(ok, scores, _NEG)

            m_old = m_ref[h]  # [n_rep_p, 1]
            m_new = jnp.maximum(
                m_old, jnp.max(scores, axis=1, keepdims=True)
            )
            corr = jnp.exp(m_old - m_new)
            p = jnp.exp(scores - m_new)  # masked cols underflow to 0
            den_ref[h] = den_ref[h] * corr + jnp.sum(
                p, axis=1, keepdims=True
            )
            vs = vs_ref[0, 0, h]  # [1, bs]
            pv = (p * vs).astype(jnp.bfloat16)
            v = v_ref[0, 0, h].astype(jnp.bfloat16)
            acc_ref[h] = acc_ref[h] * corr + jnp.dot(
                pv, v, preferred_element_type=jnp.float32
            )
            m_ref[h] = m_new

    @pl.when(s == ns - 1)
    def _():
        o_ref[0] = (acc_ref[:] / den_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bs", "softcap"))
def _decode_attention_stacked_chunked(
    q,
    k_cache,
    v_cache,
    k_scale,
    v_scale,
    lengths,
    layer,
    bs: int,
    softcap: float = 0.0,
    window=None,
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
        if Hkv % cand == 0 and 2 * cand * bs * d <= 2 * 1024 * 1024:
            hb = cand
            break

    qspec = pl.BlockSpec(
        (1, hb, n_rep_p, d),
        lambda b, h, s, lens, l, w: (b, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kvspec = pl.BlockSpec(
        (1, 1, hb, bs, d),
        lambda b, h, s, lens, l, w: (l[0], b, h, s, 0),
        memory_space=pltpu.VMEM,
    )
    scspec = pl.BlockSpec(
        (1, 1, hb, 1, bs),
        lambda b, h, s, lens, l, w: (l[0], b, h, 0, s),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, Hkv // hb, S // bs),
        in_specs=[qspec, kvspec, kvspec, scspec, scspec],
        out_specs=pl.BlockSpec(
            (1, hb, n_rep_p, d),
            lambda b, h, s, lens, l, w: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((hb, n_rep_p, 1), jnp.float32),
            pltpu.VMEM((hb, n_rep_p, 1), jnp.float32),
            pltpu.VMEM((hb, n_rep_p, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel_stacked_chunked, bs=bs, softcap=softcap
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, n_rep_p, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        lengths.astype(jnp.int32),
        jnp.asarray([layer], jnp.int32),
        jnp.asarray(
            [S + 1 if window is None else window], jnp.int32
        ).reshape(1),
        qg,
        k_cache,
        v_cache,
        ks,
        vs,
    )
    return out[:, :, :n_rep, :].reshape(B, H, d)


@functools.partial(jax.jit, static_argnames=("softcap",))
def _decode_attention_stacked(
    q,
    k_cache,
    v_cache,
    k_scale,
    v_scale,
    lengths,
    layer,
    softcap=0.0,
    alibi_slopes=None,  # [H] f32 -> in-kernel bias slopes[h]*s
    window=None,  # traced int32: sliding window (None = full causal)
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

    in_specs = [
        pl.BlockSpec(
            (1, hb, n_rep_p, d),
            lambda b, h, *_: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, hb, S, d),
            lambda b, h, lens, l, w: (l[0], b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, hb, S, d),
            lambda b, h, lens, l, w: (l[0], b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, hb, 1, S),
            lambda b, h, lens, l, w: (l[0], b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, hb, 1, S),
            lambda b, h, lens, l, w: (l[0], b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = []
    if alibi_slopes is not None:
        bias = _alibi_bias_block(alibi_slopes, Hkv, n_rep, n_rep_p, S)
        in_specs.append(
            pl.BlockSpec(
                (1, hb, n_rep_p, S),
                lambda b, h, *_: (0, h, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands = [bias]
    win_op = jnp.asarray(
        [S + 1 if window is None else window], jnp.int32
    ).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, Hkv // hb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, hb, n_rep_p, d),
            lambda b, h, *_: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel_stacked,
            softcap=softcap,
            alibi=alibi_slopes is not None,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, n_rep_p, d), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(
        lengths.astype(jnp.int32),
        jnp.asarray([layer], jnp.int32),
        win_op,
        qg,
        k_cache,
        v_cache,
        ks,
        vs,
        *operands,
    )
    return out[:, :, :n_rep, :].reshape(B, H, d)


def _alibi_bias_block(slopes, Hkv, n_rep, n_rep_p, S):
    """[1, Hkv, n_rep_p, S] additive bias slopes[h]*s (key-position
    form — equals the distance form up to a per-row constant softmax
    ignores; matches models.llama.build_mask)."""
    bias = slopes.astype(jnp.float32).reshape(Hkv, n_rep, 1) * jnp.arange(
        S, dtype=jnp.float32
    )
    if n_rep_p != n_rep:
        bias = jnp.pad(bias, ((0, 0), (0, n_rep_p - n_rep), (0, 0)))
    return bias[None]


@functools.partial(jax.jit, static_argnames=("softcap",))
def decode_attention_pallas(
    q: jax.Array,  # [B, H, d] queries for ONE decode step
    k_cache: jax.Array,  # [B, H_kv, S, d] int8 — or [L, B, H_kv, S, d]
    v_cache: jax.Array,  # (same shape as k_cache)
    k_scale: jax.Array,  # [B, H_kv, S] f32 — or [L, B, H_kv, S]
    v_scale: jax.Array,
    lengths: jax.Array,  # [B] int32: attend to cache[:length]
    layer: jax.Array = None,  # int32 scalar when caches carry the [L] axis
    softcap: float = 0.0,  # gemma2 logit soft-capping
    alibi_slopes: jax.Array = None,  # [H] f32 (bloom/mpt position bias)
    window: jax.Array = None,  # traced int32 sliding window (None = off)
) -> jax.Array:
    if k_cache.ndim == 5:
        # layer-stacked caches: select the layer INSIDE the kernel's
        # index maps (a jnp slice here would copy ~MBs per step)
        S = k_cache.shape[3]
        limit = int(os.environ.get("QLLM_TPU_ATTN_ONESHOT_S", "8192"))
        if S > limit:
            # long context: a one-shot [S, d] block stops fitting VMEM —
            # stream the cache flash-style in fixed chunks
            bs = next(
                b for b in (2048, 1024, 512, 256, 128) if S % b == 0
            )
            if alibi_slopes is not None:
                raise NotImplementedError(
                    "alibi is not wired into the chunked long-context "
                    "decode kernel — lower QLLM_TPU_ATTN_ONESHOT_S only "
                    "for non-alibi models"
                )
            return _decode_attention_stacked_chunked(
                q, k_cache, v_cache, k_scale, v_scale, lengths, layer,
                bs=bs, softcap=softcap, window=window,
            )
        return _decode_attention_stacked(
            q, k_cache, v_cache, k_scale, v_scale, lengths, layer,
            softcap=softcap, alibi_slopes=alibi_slopes, window=window,
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

    in_specs = [
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
    ]
    operands = []
    if alibi_slopes is not None:
        bias = _alibi_bias_block(alibi_slopes, Hkv, n_rep, n_rep_p, S)
        in_specs.append(
            pl.BlockSpec(
                (1, hb, n_rep_p, S),
                lambda b, h, *_: (0, h, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands = [bias]
    win_op = jnp.asarray(
        [S + 1 if window is None else window], jnp.int32
    ).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv // hb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, hb, n_rep_p, d), lambda b, h, *_: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, softcap=softcap, alibi=alibi_slopes is not None
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, n_rep_p, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * S * d,
            bytes_accessed=2 * B * Hkv * S * d + B * H * d * 4,
            transcendentals=B * H * S,
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        lengths.astype(jnp.int32),
        win_op,
        qg,
        k_cache,
        v_cache,
        ks,
        vs,
        *operands,
    )
    return out[:, :, :n_rep, :].reshape(B, H, d)


# --------------------------------------------------------------------------
# Flash prefill attention (T > 1): blockwise causal attention with online
# softmax — the O(S^2)-logits-free prefill path. Float K/V (just-projected
# activations or the dequantized cache), GQA-native: each program handles
# one kv head's whole query group, so K/V are never jnp.repeat'ed.
# --------------------------------------------------------------------------


def _flash_qk(q_ref, k_ref, ks_ref, n_rep: int, softcap: float):
    """[R, bs] f32 scores for one (q-tile, kv-block). int8 K's per-key
    scale folds into the score COLUMNS (the decode-kernel pattern,
    _attn_kernel) so no [bs, d] dequant materializes."""
    d = q_ref.shape[-1]
    R = q_ref.shape[1] * n_rep
    q = q_ref[0, :, 0].reshape(R, d)  # row r: query t = r // n_rep
    k = k_ref[0, 0]  # [bs, d] bf16 or int8
    if ks_ref is not None:
        k = k.astype(jnp.bfloat16)
    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, bs]
    if ks_ref is not None:
        scores = scores * ks_ref[0, 0]  # [1, bs] per-key scale
    if softcap:
        # gemma2: cap*tanh(logits/cap) on the TRUE logits (after the
        # int8-K scale fold), BEFORE the causal mask
        scores = softcap * jnp.tanh(scores * (1.0 / softcap))
    return scores


def _flash_mask(scores, it, s, pos, s_valid, win, bq: int, bs: int, n_rep: int):
    row_t = it * bq + jax.lax.broadcasted_iota(
        jnp.int32, scores.shape, 0
    ) // n_rep
    col = s * bs + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    row_pos = pos + row_t
    valid = (col <= row_pos) & (col < s_valid) & (col > row_pos - win)
    return jnp.where(valid, scores, _NEG)


def _flash_pv(p, v_ref, vs_ref):
    """p @ V with int8 V's per-key scale folded into the probs."""
    if vs_ref is not None:
        p = p * vs_ref[0, 0]
    v = v_ref[0, 0]  # [bs, d]
    if vs_ref is not None:
        v = v.astype(jnp.bfloat16)
    return jnp.dot(
        p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32
    )


def _flash_prefill_kernel_1kv(
    pos_ref,  # scalar prefetch: [B] query position offsets
    svalid_ref,  # scalar prefetch: [1] true key count (S before padding)
    win_ref,  # scalar prefetch: [1] sliding window (S+1 = off)
    q_ref,  # [1, bq, 1, n_rep, d] bf16 (pre-scaled by 1/sqrt(d))
    k_ref,  # [1, 1, bs, d] bf16|int8 (cache-native [B, Hkv, S, d])
    v_ref,
    *refs,  # ([ks_ref, vs_ref] int8 KV), o_ref
    bq: int,
    bs: int,
    n_rep: int,
    softcap: float = 0.0,
):
    """Whole-S-in-one-block prefill attention (Sp == bs — every shape
    up to S=2048 with the default key blocks). No online-softmax state:
    softmax is computed locally and the normalized tile emitted
    directly, removing the scratch init/correct/emit passes the general
    kernel pays per step (the structural gap vs jax's flash single-step
    path measured at T=512)."""
    if len(refs) == 3:
        ks_ref, vs_ref, o_ref = refs
    else:
        (o_ref,) = refs
        ks_ref = vs_ref = None
    b = pl.program_id(0)
    it = pl.program_id(2)
    d = q_ref.shape[-1]
    pos = pos_ref[b]

    scores = _flash_qk(q_ref, k_ref, ks_ref, n_rep, softcap)
    scores = _flash_mask(
        scores, it, 0, pos, svalid_ref[0], win_ref[0], bq, bs, n_rep
    )
    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    den = jnp.sum(p, axis=1, keepdims=True)
    out = _flash_pv(p, v_ref, vs_ref)
    o_ref[0, :, 0] = (out / den).reshape(bq, n_rep, d).astype(o_ref.dtype)


def _flash_prefill_kernel(
    pos_ref,  # scalar prefetch: [B] query position offsets
    svalid_ref,  # scalar prefetch: [1] true key count (S before padding)
    win_ref,  # scalar prefetch: [1] sliding window (S+1 = off)
    q_ref,  # [1, bq, 1, n_rep, d] bf16 (pre-scaled by 1/sqrt(d))
    k_ref,  # [1, 1, bs, d] bf16|int8 (cache-native [B, Hkv, S, d] layout)
    v_ref,  # [1, 1, bs, d]
    *refs,  # ([ks_ref, vs_ref] int8 KV), o_ref, then scratch m/den/acc
    bq: int,
    bs: int,
    n_rep: int,
    softcap: float = 0.0,
):
    if len(refs) == 6:
        ks_ref, vs_ref, o_ref, m_ref, den_ref, acc_ref = refs
    else:
        o_ref, m_ref, den_ref, acc_ref = refs
        ks_ref = vs_ref = None
    b = pl.program_id(0)
    it = pl.program_id(2)
    s = pl.program_id(3)
    ns = pl.num_programs(3)
    d = q_ref.shape[-1]
    pos = pos_ref[b]
    s_valid = svalid_ref[0]
    win = win_ref[0]

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        den_ref[:] = jnp.zeros_like(den_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def update(scores):
        m_old = m_ref[:]
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=1, keepdims=True))
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(scores - m_new)
        den_ref[:] = den_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * corr + _flash_pv(p, v_ref, vs_ref)
        m_ref[:] = m_new

    # tile classification (VPU passes over [R, bs] dominate this kernel;
    # interior tiles — every key visible to every query — skip the two
    # iotas, compares, and where). ``win`` adds sliding-window
    # semantics: key s visible to query at absolute p iff p - s < win;
    # window-off calls pass win = S+1, making the window terms no-ops.
    # Invisible tiles also skip the HBM fetch: the kv index maps clamp
    # the block index to the visible range, so skipped grid steps remap
    # to an already-resident block and Pallas elides the copy.
    first_q = pos + it * bq  # earliest query position in the tile
    max_q = first_q + (bq - 1)
    last_k = s * bs + bs - 1
    visible = (s * bs <= max_q) & (last_k > first_q - win)
    interior = (
        (last_k <= first_q)
        & (last_k < s_valid)
        & (s * bs > max_q - win)
    )

    @pl.when(visible & interior)
    def _():
        update(_flash_qk(q_ref, k_ref, ks_ref, n_rep, softcap))

    @pl.when(visible & jnp.logical_not(interior))
    def _():
        scores = _flash_qk(q_ref, k_ref, ks_ref, n_rep, softcap)
        update(
            _flash_mask(scores, it, s, pos, s_valid, win, bq, bs, n_rep)
        )

    @pl.when(s == ns - 1)
    def _():
        o_ref[0, :, 0] = (
            (acc_ref[:] / den_ref[:]).reshape(bq, n_rep, d)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_rep", "softcap", "kv_native", "out_dtype")
)
def prefill_attention_flash(
    q: jax.Array,  # [B, T, H, d]
    k: jax.Array,  # [B, S, Hkv, d] (or [B, Hkv, S, d] when kv_native)
    v: jax.Array,
    pos,  # scalar or [B]: query t sits at absolute position pos + t
    n_rep: int,
    softcap: float = 0.0,
    window: jax.Array = None,  # traced int32 sliding window (None = off)
    kv_native: bool = False,  # k/v already in cache layout [B, Hkv, S, d]
    kv_scales=None,  # (k_scale, v_scale) [B, Hkv, S] f32 -> int8 K/V
    out_dtype=None,  # None = f32 (back-compat); serving passes bf16
) -> jax.Array:
    """Blockwise causal prefill attention, numerics matching
    models.llama._attention with build_mask's causal(+offset) mask:
    key s is visible to query t iff s <= pos + t. Output [B, T, H, d].
    T and S are padded to block multiples internally (extra rows are
    sliced off, extra key columns masked).

    ``kv_native`` + ``kv_scales``: the chunked-admission/cached prefill
    path feeds the INT8 KV cache tensors directly (layer_kv_raw layout)
    — the kernel reads half the KV bytes and the XLA dequant +
    double-transpose glue of layer_kv disappears (scales fold into
    score columns / probs, the decode-kernel pattern).

    Whole-S-in-one-key-block shapes take a scratchless single-step
    kernel (softmax computed locally per q-tile); larger S runs the
    online-softmax kernel whose kv index maps CLAMP invisible blocks to
    the visible range, so above-diagonal (and out-of-window) grid steps
    skip both compute and the HBM block copy."""
    B, T, H, d = q.shape
    if kv_native:
        S, Hkv = k.shape[2], k.shape[1]
    else:
        S, Hkv = k.shape[1], k.shape[2]
    import os as _os

    bq = int(
        _os.environ.get("QLLM_TPU_FLASH_BQ", "0")
    ) or max(8, min(256, 512 // n_rep))
    # key-block: as large as S admits up to 2048 — swept on v5e at the
    # 7B shape (tools/sweep_flash_prefill.py, 2026-08-20): T=2048
    # bs 512->2048 is 1.78->1.18 ms/layer-call (+51% throughput); T=512
    # keeps bs=512 (whole-S). VMEM: scores R x bs f32 <= 4 MB at R=512.
    bs = int(_os.environ.get("QLLM_TPU_FLASH_BS", "0")) or (
        2048
        if S >= 2048
        else 1024
        if S >= 1024
        else 512
        if S >= 512
        else 256
        if S >= 256
        else 128
    )
    bq = min(bq, max(8, -(-T // 8) * 8))
    bs = min(bs, -(-S // 128) * 128)
    Tp = -(-T // bq) * bq
    Sp = -(-S // bs) * bs
    ns = Sp // bs
    qg = (q.astype(jnp.float32) * (d**-0.5)).astype(jnp.bfloat16)
    qg = qg.reshape(B, T, Hkv, n_rep, d)
    if Tp != T:
        qg = jnp.pad(qg, ((0, 0), (0, Tp - T), (0, 0), (0, 0), (0, 0)))
    # kernel-side K/V layout is cache-native [B, Hkv, S, d]: Mosaic
    # requires the last two block dims (>=8-sublane, 128-lane) — an
    # [S, Hkv] ordering cannot tile per-head
    if kv_native:
        kb, vb = k, v
        if kv_scales is None:
            kb = kb.astype(jnp.bfloat16)
            vb = vb.astype(jnp.bfloat16)
    else:
        assert kv_scales is None, "int8 kv_scales require kv_native layout"
        kb = k.astype(jnp.bfloat16).transpose(0, 2, 1, 3)
        vb = v.astype(jnp.bfloat16).transpose(0, 2, 1, 3)
    if Sp != S:
        pad = ((0, 0), (0, 0), (0, Sp - S), (0, 0))
        kb = jnp.pad(kb, pad)
        vb = jnp.pad(vb, pad)
    pos_b = jnp.broadcast_to(jnp.asarray(pos), (B,)).astype(jnp.int32)

    qspec = pl.BlockSpec(
        (1, bq, 1, n_rep, d),
        lambda b, h, it, s, pos, sv, w: (b, it, h, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def _s_eff(b, it, s, pos, w):
        # clamp to this q-tile's visible kv-block range: invisible grid
        # steps re-map to an already-resident block (no HBM copy); the
        # kernel's `visible` predicate (on the ORIGINAL s) skips compute
        hi = jnp.minimum(
            jax.lax.div(pos[b] + it * bq + bq - 1, bs), ns - 1
        )
        lo = jnp.maximum(jax.lax.div(pos[b] + it * bq - w[0] + 1, bs), 0)
        return jnp.clip(s, jnp.minimum(lo, hi), hi)

    kvspec = pl.BlockSpec(
        (1, 1, bs, d),
        lambda b, h, it, s, pos, sv, w: (b, h, _s_eff(b, it, s, pos, w), 0),
        memory_space=pltpu.VMEM,
    )
    inputs = [qg, kb, vb]
    in_specs = [qspec, kvspec, kvspec]
    if kv_scales is not None:
        ksc, vsc = kv_scales
        ksc = ksc.astype(jnp.float32).reshape(B, Hkv, 1, S)
        vsc = vsc.astype(jnp.float32).reshape(B, Hkv, 1, S)
        if Sp != S:
            spad = ((0, 0), (0, 0), (0, 0), (0, Sp - S))
            ksc = jnp.pad(ksc, spad)
            vsc = jnp.pad(vsc, spad)
        sspec = pl.BlockSpec(
            (1, 1, 1, bs),
            lambda b, h, it, s, pos, sv, w: (
                b,
                h,
                0,
                _s_eff(b, it, s, pos, w),
            ),
            memory_space=pltpu.VMEM,
        )
        inputs += [ksc, vsc]
        in_specs += [sspec, sspec]
    R = bq * n_rep
    odt = jnp.float32 if out_dtype is None else out_dtype
    kern = functools.partial(
        _flash_prefill_kernel_1kv if ns == 1 else _flash_prefill_kernel,
        bq=bq,
        bs=bs,
        n_rep=n_rep,
        softcap=softcap,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, Hkv, Tp // bq, ns),
        in_specs=in_specs,
        out_specs=qspec,
        scratch_shapes=(
            []
            if ns == 1
            else [
                pltpu.VMEM((R, 1), jnp.float32),
                pltpu.VMEM((R, 1), jnp.float32),
                pltpu.VMEM((R, d), jnp.float32),
            ]
        ),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Tp, Hkv, n_rep, d), odt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel",
                "parallel",
                "parallel",
                "arbitrary",
            ),
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        pos_b,
        jnp.asarray([S], jnp.int32),
        jnp.asarray(
            [S + 1 if window is None else window], jnp.int32
        ).reshape(1),
        *inputs,
    )
    return out[:, :T].reshape(B, T, H, d)


# --------------------------------------------------------------------------
# Partial-stats decode attention: the sequence-parallel building block.
# Returns UNNORMALIZED (acc, m, den) for this device's KV shard so a
# log-sum-exp merge across the mesh's sequence axis (parallel.sp_attention)
# reconstructs exact attention — SURVEY §5's "shard the quantized KV cache
# and attention over the mesh" requirement.
# --------------------------------------------------------------------------


def _attn_kernel_stacked_partial(
    lengths_ref,  # scalar prefetch: [B] LOCAL valid lengths (may be 0)
    layer_ref,  # scalar prefetch: [1]
    q_ref,  # [1, hb, n_rep_p, d] bf16 (pre-scaled)
    k_ref,  # [1, 1, hb, S, d] int8
    v_ref,
    ks_ref,  # [1, 1, hb, 1, S] f32
    vs_ref,
    acc_ref,  # out [1, hb, n_rep_p, d] f32 — UNNORMALIZED sum(p·v)
    m_ref,  # out [1, hb, n_rep_p, 1] f32 — local max score
    den_ref,  # out [1, hb, n_rep_p, 1] f32 — local sum(exp)
):
    del layer_ref
    b = pl.program_id(0)
    length = lengths_ref[b]
    hb = k_ref.shape[2]
    for h in range(hb):
        q = q_ref[0, h]  # [n_rep_p, d]
        k = k_ref[0, 0, h].astype(jnp.bfloat16)  # [S, d]
        ks = ks_ref[0, 0, h]  # [1, S]
        scores = (
            jax.lax.dot_general(
                q,
                k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * ks
        )
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        valid = col < length
        scores = jnp.where(valid, scores, _NEG)
        m = jnp.max(scores, axis=1, keepdims=True)  # _NEG when length==0
        # explicit zeroing: when length==0, exp(scores - m) would be 1
        p = jnp.exp(scores - m) * valid.astype(jnp.float32)
        den = jnp.sum(p, axis=1, keepdims=True)
        vs = vs_ref[0, 0, h]
        pv = (p * vs).astype(jnp.bfloat16)
        v = v_ref[0, 0, h].astype(jnp.bfloat16)
        acc_ref[0, h] = jnp.dot(pv, v, preferred_element_type=jnp.float32)
        m_ref[0, h] = m
        den_ref[0, h] = den


@functools.partial(jax.jit, static_argnames=())
def decode_attention_partial(
    q,  # [B, H, d]
    k_cache,  # [L, B, Hkv, S, d] int8 (S = this device's shard)
    v_cache,
    k_scale,  # [L, B, Hkv, S] f32
    v_scale,
    lengths,  # [B] int32 LOCAL lengths into this shard (clipped, may be 0)
    layer,
):
    """(acc [B,H,d], m [B,H,1], den [B,H,1]) partial attention stats over
    a local KV shard; exact merge: out = Σ acc_i·e^(m_i−m) / Σ den_i·e^(m_i−m),
    m = max_i m_i."""
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

    qspec = pl.BlockSpec(
        (1, hb, n_rep_p, d), lambda b, h, *_: (b, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kvspec = pl.BlockSpec(
        (1, 1, hb, S, d),
        lambda b, h, lens, l: (l[0], b, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    scspec = pl.BlockSpec(
        (1, 1, hb, 1, S),
        lambda b, h, lens, l: (l[0], b, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv // hb),
        in_specs=[qspec, kvspec, kvspec, scspec, scspec],
        out_specs=[
            qspec,
            pl.BlockSpec(
                (1, hb, n_rep_p, 1), lambda b, h, *_: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hb, n_rep_p, 1), lambda b, h, *_: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    acc, m, den = pl.pallas_call(
        _attn_kernel_stacked_partial,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, n_rep_p, d), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, n_rep_p, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, n_rep_p, 1), jnp.float32),
        ],
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
    acc = acc[:, :, :n_rep, :].reshape(B, H, d)
    m = m[:, :, :n_rep, :].reshape(B, H, 1)
    den = den[:, :, :n_rep, :].reshape(B, H, 1)
    return acc, m, den


# --------------------------------------------------------------------------
# Ring-fused decode attention: the per-token KV write rides INSIDE the
# attention launch.
#
# The separate kv_cache_write_pallas launch costs a fixed ~2.4 us/layer —
# ~76 us/token on 7B, pure launch floor. Fusing the write into the
# attention kernel naively forces XLA to copy the whole cache (the cache
# buffer would be both a read operand and a donated output — see
# _kv_write_kernel's docstring). Instead, recent tokens live in a SMALL
# bf16 ring [L, B, H_kv, 8, d] that the attention kernel reads AND
# updates (aliased — it is a different buffer from the cache, so no
# copy), while the big int8 cache stays read-only. Once per 8 steps a
# single ALL-LAYERS flush kernel quantizes the full rings into their
# 8-row cache windows (aliased window writes, exactly the
# _kv_write_kernel pattern) — one launch per 8 tokens instead of one per
# layer per token.
#
# Contract: positions [0, flushed) live int8 in the cache where
# flushed = (pos // 8) * 8; positions [flushed, pos) live bf16 in ring
# slots [0, pos - flushed); the CURRENT token's k/v arrive as operands
# and are appended to slot (pos - flushed) by the same kernel. The
# driver (models.decode_loop) must flush whenever pos crosses a multiple
# of 8, so decode must START 8-aligned (prefill lengths padded to 8).
# This also slightly IMPROVES numerics: the ~8 most recent tokens attend
# at bf16 instead of int8.
# --------------------------------------------------------------------------

RING = 8  # ring depth == cache write-window rows (Mosaic sublane minimum)


def _attn_kernel_stacked_ring(
    lengths_ref,  # scalar prefetch: [B] = pos (PAST tokens; current excluded)
    layer_ref,  # scalar prefetch: [1]
    q_ref,  # [1, hb, n_rep_p, d] bf16 (pre-scaled by 1/sqrt(d))
    kn_ref,  # [1, hb, 1, d] f32 — CURRENT token k (post-rope)
    vn_ref,  # [1, hb, 1, d] f32
    k_ref,  # [1, 1, hb, S, d] int8 (layer-selected)
    v_ref,
    ks_ref,  # [1, 1, hb, 1, S] f32
    vs_ref,
    rk_ref,  # [1, 1, hb, RING, d] bf16 ring (layer-selected)
    rv_ref,
    o_ref,  # [1, hb, n_rep_p, d]
    rko_ref,  # aliased ring outputs (current token appended)
    rvo_ref,
):
    del layer_ref
    b = pl.program_id(0)
    hb = k_ref.shape[2]
    length = lengths_ref[b]
    flushed = (length // RING) * RING
    nring = length - flushed
    for h in range(hb):
        q = q_ref[0, h]  # [n_rep_p, d] bf16
        # ---- int8 cache part (positions [0, flushed)) ----
        k = k_ref[0, 0, h].astype(jnp.bfloat16)  # [S, d]
        ks = ks_ref[0, 0, h]  # [1, S]
        scores = (
            jax.lax.dot_general(
                q,
                k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * ks
        )
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < flushed, scores, _NEG)
        # ---- bf16 ring part (positions [flushed, length)) ----
        rk = rk_ref[0, 0, h]  # [RING, d] bf16
        rscores = jax.lax.dot_general(
            q,
            rk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [n_rep_p, RING]
        rcol = jax.lax.broadcasted_iota(jnp.int32, rscores.shape, 1)
        rscores = jnp.where(rcol < nring, rscores, _NEG)
        # ---- current token (position length, always valid) ----
        # elementwise multiply + lane reduce (a [n_rep_p,1] dot against
        # a [1,d] operand trips a Mosaic mixed-type broadcast verifier)
        kn = kn_ref[0, h]  # [1, d] f32
        cscore = jnp.sum(
            q.astype(jnp.float32) * kn, axis=1, keepdims=True
        )  # [n_rep_p, 1]

        m = jnp.maximum(
            jnp.maximum(
                jnp.max(scores, axis=1, keepdims=True),
                jnp.max(rscores, axis=1, keepdims=True),
            ),
            cscore,
        )
        p = jnp.exp(scores - m)
        pr = jnp.exp(rscores - m)
        pc = jnp.exp(cscore - m)
        denom = (
            jnp.sum(p, axis=1, keepdims=True)
            + jnp.sum(pr, axis=1, keepdims=True)
            + pc
        )
        vs = vs_ref[0, 0, h]  # [1, S]
        pv = (p * vs).astype(jnp.bfloat16)
        v = v_ref[0, 0, h].astype(jnp.bfloat16)
        out = jnp.dot(pv, v, preferred_element_type=jnp.float32)
        rv = rv_ref[0, 0, h]  # [RING, d] bf16
        out = out + jnp.dot(
            pr.astype(jnp.bfloat16), rv, preferred_element_type=jnp.float32
        )
        vn = vn_ref[0, h].astype(jnp.float32)  # [1, d]
        out = out + pc * vn
        o_ref[0, h] = (out / denom).astype(o_ref.dtype)

        # ---- append current token to ring slot nring ----
        d_ = kn.shape[-1]
        rsel = jax.lax.broadcasted_iota(jnp.int32, (RING, d_), 0) == nring
        rko_ref[0, 0, h] = jnp.where(
            rsel, jnp.broadcast_to(kn.astype(rk.dtype), (RING, d_)), rk
        )
        rvo_ref[0, 0, h] = jnp.where(
            rsel,
            jnp.broadcast_to(vn.astype(rv.dtype), (RING, d_)),
            rv,
        )


@functools.partial(jax.jit, static_argnames=())
def decode_attention_ring(
    q: jax.Array,  # [B, H, d] this step's queries
    k_new: jax.Array,  # [B, H_kv, d] this step's k (post-rope)
    v_new: jax.Array,
    k_cache: jax.Array,  # [L, B, H_kv, S, d] int8 (read-only here)
    v_cache: jax.Array,
    k_scale: jax.Array,  # [L, B, H_kv, S] f32
    v_scale: jax.Array,
    ring_k: jax.Array,  # [L, B, H_kv, RING, d] bf16 (updated, aliased)
    ring_v: jax.Array,
    lengths: jax.Array,  # [B] int32 = pos: past tokens (current excluded)
    layer: jax.Array,
):
    """Fused decode attention + KV append. Returns (attn [B, H, d],
    ring_k', ring_v') — the int8 cache is NOT written here; the driver
    flushes full rings via kv_ring_flush_pallas every RING steps."""
    B, H, d = q.shape
    L, _, Hkv, S, _ = k_cache.shape
    n_rep = H // Hkv
    n_rep_p = max(8, ((n_rep + 7) // 8) * 8)
    qg = q.astype(jnp.float32) * (d**-0.5)
    qg = qg.reshape(B, Hkv, n_rep, d)
    if n_rep_p != n_rep:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, n_rep_p - n_rep), (0, 0)))
    qg = qg.astype(jnp.bfloat16)
    kn = k_new.reshape(B, Hkv, 1, d).astype(jnp.float32)
    vn = v_new.reshape(B, Hkv, 1, d).astype(jnp.float32)
    ks = k_scale.reshape(L, B, Hkv, 1, S).astype(jnp.float32)
    vs = v_scale.reshape(L, B, Hkv, 1, S).astype(jnp.float32)

    hb = 1
    hb_env = int(os.environ.get("QLLM_TPU_ATTN_HB", "0"))
    # 16 first: swept 2026-08-18 (tools/sweep_attn_hb.py) — hb=16 edges
    # out 8 (18.7 vs 19.3 us/layer standalone) and 32 regresses; the
    # 2 MB VMEM cap still drops long-S caches to smaller blocks
    for cand in (hb_env,) if hb_env else (16, 8, 4, 2):
        if Hkv % cand == 0 and 2 * cand * S * d <= 2 * 1024 * 1024:
            hb = cand
            break

    bh_spec = lambda b, h, *_: (b, h, 0, 0)  # noqa: E731
    layer_spec = lambda b, h, lens, l: (l[0], b, h, 0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv // hb),
        in_specs=[
            pl.BlockSpec(
                (1, hb, n_rep_p, d), bh_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, hb, 1, d), bh_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, 1, d), bh_spec, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, hb, S, d), layer_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, S, d), layer_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, 1, S), layer_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, 1, S), layer_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, RING, d), layer_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, RING, d), layer_spec, memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, hb, n_rep_p, d), bh_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, RING, d), layer_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, RING, d), layer_spec, memory_space=pltpu.VMEM
            ),
        ],
    )
    out, rk2, rv2 = pl.pallas_call(
        _attn_kernel_stacked_ring,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            # (b, h) tiles are independent: lets Mosaic overlap the next
            # head-block's K/V DMA with this one's compute
            dimension_semantics=("parallel", "parallel"),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, n_rep_p, d), jnp.float32),
            jax.ShapeDtypeStruct(ring_k.shape, ring_k.dtype),
            jax.ShapeDtypeStruct(ring_v.shape, ring_v.dtype),
        ],
        # operand indices count the scalar-prefetch args (lengths, layer)
        input_output_aliases={9: 1, 10: 2},
        interpret=jax.default_backend() == "cpu",
    )(
        lengths.astype(jnp.int32),
        jnp.asarray([layer], jnp.int32),
        qg,
        kn,
        vn,
        k_cache,
        v_cache,
        ks,
        vs,
        ring_k,
        ring_v,
    )
    return out[:, :, :n_rep, :].reshape(B, H, d), rk2, rv2


def _ring_flush_kernel(
    pos_ref,  # scalar prefetch: [B] — pos AFTER the group (multiple of 8)
    rk_ref,  # [1, 1, hb, RING, d] bf16 (full ring: positions [pos-8, pos))
    rv_ref,
    kw_ref,  # [1, 1, hb, RING, d] int8 cache window at rows [pos-8, pos)
    vw_ref,
    ksw_ref,  # [1, 1, hb, 1, S] f32 scale row
    vsw_ref,
    ko_ref,  # aliased outputs
    vo_ref,
    kso_ref,
    vso_ref,
):
    """Quantize a FULL ring into its 8-row cache window (all layers in
    one launch: grid (L, B, H_kv/hb) — amortizes the write launch to
    ~1/RING of a kv_cache_write_pallas per token)."""
    b = pl.program_id(1)
    pos = pos_ref[b]
    start = pos - RING
    hb = rk_ref.shape[2]
    S = ksw_ref.shape[-1]
    for h in range(hb):
        rk = rk_ref[0, 0, h].astype(jnp.float32)  # [RING, d]
        rv = rv_ref[0, 0, h].astype(jnp.float32)
        kamax = jnp.max(jnp.abs(rk), axis=1, keepdims=True)  # [RING, 1]
        ksc = jnp.maximum(kamax / 127.0, 1e-8)
        vamax = jnp.max(jnp.abs(rv), axis=1, keepdims=True)
        vsc = jnp.maximum(vamax / 127.0, 1e-8)
        ko_ref[0, 0, h] = jnp.clip(jnp.round(rk / ksc), -127, 127).astype(
            jnp.int8
        )
        vo_ref[0, 0, h] = jnp.clip(jnp.round(rv / vsc), -127, 127).astype(
            jnp.int8
        )
        # scatter the RING per-row scales into the [1, S] scale row:
        # sel[r, j] = (j == start + r); new = sum_r sel * scale_r
        row = jax.lax.broadcasted_iota(jnp.int32, (RING, S), 0)
        colj = jax.lax.broadcasted_iota(jnp.int32, (RING, S), 1)
        sel = colj == (start + row)
        knew = jnp.sum(jnp.where(sel, ksc, 0.0), axis=0, keepdims=True)
        vnew = jnp.sum(jnp.where(sel, vsc, 0.0), axis=0, keepdims=True)
        hit = jnp.any(sel, axis=0, keepdims=True)  # [1, S]
        kso_ref[0, 0, h] = jnp.where(hit, knew, ksw_ref[0, 0, h])
        vso_ref[0, 0, h] = jnp.where(hit, vnew, vsw_ref[0, 0, h])


@functools.partial(jax.jit, static_argnames=())
def kv_ring_flush_pallas(
    k_cache: jax.Array,  # [L, B, H_kv, S, d] int8
    v_cache: jax.Array,
    k_scale: jax.Array,  # [L, B, H_kv, S] f32
    v_scale: jax.Array,
    ring_k: jax.Array,  # [L, B, H_kv, RING, d] bf16 — FULL rings
    ring_v: jax.Array,
    pos: jax.Array,  # [B] int32: position AFTER the group (multiple of 8)
):
    """Quantize + write every layer's full ring into the int8 cache at
    rows [pos-8, pos) — ONE launch for the whole model. Returns
    (k_cache', v_cache', k_scale', v_scale'); rings are dead afterwards
    (the next group overwrites every slot before it is read)."""
    L, B, Hkv, S, d = k_cache.shape
    ks5 = k_scale.reshape(L, B, Hkv, 1, S)
    vs5 = v_scale.reshape(L, B, Hkv, 1, S)
    hb = 1
    for cand in (8, 4, 2):
        if Hkv % cand == 0:
            hb = cand
            break

    ring_spec = lambda l, b, h, p: (l, b, h, 0, 0)  # noqa: E731
    win_spec = lambda l, b, h, p: (l, b, h, p[b] // RING - 1, 0)  # noqa: E731
    row_spec = lambda l, b, h, p: (l, b, h, 0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B, Hkv // hb),
        in_specs=[
            pl.BlockSpec(
                (1, 1, hb, RING, d), ring_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, RING, d), ring_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, RING, d), win_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, RING, d), win_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, 1, S), row_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, 1, S), row_spec, memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, hb, RING, d), win_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, RING, d), win_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, 1, S), row_spec, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, hb, 1, S), row_spec, memory_space=pltpu.VMEM
            ),
        ],
    )
    k2, v2, ks2, vs2 = pl.pallas_call(
        _ring_flush_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(ks5.shape, jnp.float32),
            jax.ShapeDtypeStruct(vs5.shape, jnp.float32),
        ],
        # indices count the scalar-prefetch operand (pos)
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
        interpret=jax.default_backend() == "cpu",
    )(
        pos.astype(jnp.int32),
        ring_k,
        ring_v,
        k_cache,
        v_cache,
        ks5,
        vs5,
    )
    return k2, v2, ks2.reshape(L, B, Hkv, S), vs2.reshape(L, B, Hkv, S)
