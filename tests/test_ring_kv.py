"""Ring-fused decode attention: KV write inside the attention kernel.

The ring path keeps the ≤8 newest tokens bf16 in a small ring that the
attention kernel reads AND appends to (aliased), with an all-layers
flush kernel quantizing full rings into the int8 cache every 8 steps —
no per-token write launch (ops/pallas_attention.py ring section).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qllm_tpu.ops.kv_cache import QuantizedKVCache, _quantize_kv
from qllm_tpu.ops.pallas_attention import (
    RING,
    decode_attention_ring,
    kv_ring_flush_pallas,
)


def _dense_ref(q, ks_list, vs_list, d):
    """Reference over an explicit per-batch list of (k, v) float rows."""
    B, H, _ = q.shape
    out = np.zeros((B, H, d), np.float32)
    for b in range(B):
        k = ks_list[b]  # [T_b, Hkv, d]
        v = vs_list[b]
        T = k.shape[0]
        Hkv = k.shape[1]
        n_rep = H // Hkv
        for h in range(H):
            hk = h // n_rep
            scores = (k[:, hk] @ q[b, h]) / np.sqrt(d)  # [T]
            p = np.exp(scores - scores.max())
            p /= p.sum()
            out[b, h] = p @ v[:, hk]
    return out


@pytest.mark.parametrize("n_rep", [1, 4])
def test_ring_attention_matches_dense_reference(n_rep):
    rng = np.random.default_rng(3)
    L, B, Hkv, S, d = 3, 2, 2, 64, 128
    H = Hkv * n_rep
    layer = 1
    pos = np.array([19, 10], np.int32)  # flushed 16/8, ring 3/2

    q = rng.normal(size=(B, H, d)).astype(np.float32)
    k8 = rng.integers(-127, 128, (L, B, Hkv, S, d)).astype(np.int8)
    v8 = rng.integers(-127, 128, (L, B, Hkv, S, d)).astype(np.int8)
    ksc = rng.uniform(0.005, 0.02, (L, B, Hkv, S)).astype(np.float32)
    vsc = rng.uniform(0.005, 0.02, (L, B, Hkv, S)).astype(np.float32)
    ring_k = (rng.normal(size=(L, B, Hkv, RING, d)) * 0.5).astype(np.float32)
    ring_v = (rng.normal(size=(L, B, Hkv, RING, d)) * 0.5).astype(np.float32)
    rk = jnp.asarray(ring_k, jnp.bfloat16)
    rv = jnp.asarray(ring_v, jnp.bfloat16)
    k_new = (rng.normal(size=(B, Hkv, d)) * 0.5).astype(np.float32)
    v_new = (rng.normal(size=(B, Hkv, d)) * 0.5).astype(np.float32)

    out, rk2, rv2 = decode_attention_ring(
        jnp.asarray(q),
        jnp.asarray(k_new),
        jnp.asarray(v_new),
        jnp.asarray(k8),
        jnp.asarray(v8),
        jnp.asarray(ksc),
        jnp.asarray(vsc),
        rk,
        rv,
        jnp.asarray(pos),
        jnp.int32(layer),
    )

    # reference sequence per batch: dequant cache rows [0, flushed) +
    # bf16 ring rows [0, pos - flushed) + the current token
    rk_f = np.asarray(rk, np.float32)
    rv_f = np.asarray(rv, np.float32)
    ks_list, vs_list = [], []
    for b in range(B):
        fl = (pos[b] // RING) * RING
        nring = pos[b] - fl
        kd = (
            k8[layer, b].astype(np.float32)
            * ksc[layer, b][..., None]
        ).transpose(1, 0, 2)[:fl]  # [fl, Hkv, d]
        vd = (
            v8[layer, b].astype(np.float32)
            * vsc[layer, b][..., None]
        ).transpose(1, 0, 2)[:fl]
        kr = rk_f[layer, b].transpose(1, 0, 2)[:nring]
        vr = rv_f[layer, b].transpose(1, 0, 2)[:nring]
        ks_list.append(np.concatenate([kd, kr, k_new[b][None]], axis=0))
        vs_list.append(np.concatenate([vd, vr, v_new[b][None]], axis=0))
    ref = _dense_ref(q, ks_list, vs_list, d)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-2, rtol=3e-2)

    # the kernel appended the current token at slot (pos - flushed),
    # left other slots untouched — on the selected layer only
    rk2 = np.asarray(rk2, np.float32)
    rv2 = np.asarray(rv2, np.float32)
    for b in range(B):
        slot = pos[b] - (pos[b] // RING) * RING
        np.testing.assert_allclose(
            rk2[layer, b, :, slot], k_new[b], atol=1e-2
        )
        np.testing.assert_allclose(
            rv2[layer, b, :, slot], v_new[b], atol=1e-2
        )
        keep = [s for s in range(RING) if s != slot]
        np.testing.assert_array_equal(
            rk2[layer, b][:, keep], rk_f[layer, b][:, keep]
        )
    other = 0 if layer != 0 else 2
    np.testing.assert_array_equal(rk2[other], rk_f[other])


def test_ring_flush_quantizes_into_window():
    rng = np.random.default_rng(5)
    L, B, Hkv, S, d = 2, 2, 4, 64, 128
    pos = np.array([16, 24], np.int32)  # windows rows [8,16) and [16,24)

    k8 = rng.integers(-127, 128, (L, B, Hkv, S, d)).astype(np.int8)
    v8 = rng.integers(-127, 128, (L, B, Hkv, S, d)).astype(np.int8)
    ksc = rng.uniform(0.005, 0.02, (L, B, Hkv, S)).astype(np.float32)
    vsc = rng.uniform(0.005, 0.02, (L, B, Hkv, S)).astype(np.float32)
    ring_k = jnp.asarray(
        rng.normal(size=(L, B, Hkv, RING, d)) * 0.5, jnp.bfloat16
    )
    ring_v = jnp.asarray(
        rng.normal(size=(L, B, Hkv, RING, d)) * 0.5, jnp.bfloat16
    )

    k2, v2, ks2, vs2 = kv_ring_flush_pallas(
        jnp.asarray(k8),
        jnp.asarray(v8),
        jnp.asarray(ksc),
        jnp.asarray(vsc),
        ring_k,
        ring_v,
        jnp.asarray(pos),
    )
    k2, ks2 = np.asarray(k2), np.asarray(ks2)

    # expected per-row symmetric int8 quantization of the ring
    qk, qs = _quantize_kv(ring_k)
    qk, qs = np.asarray(qk), np.asarray(qs)
    for b in range(B):
        lo = pos[b] - RING
        np.testing.assert_array_equal(
            k2[:, b, :, lo : pos[b]], qk[:, b]
        )
        np.testing.assert_allclose(
            ks2[:, b, :, lo : pos[b]], qs[:, b], rtol=1e-5
        )
        # rows outside the window untouched
        np.testing.assert_array_equal(k2[:, b, :, : lo], k8[:, b, :, : lo])
        np.testing.assert_array_equal(
            k2[:, b, :, pos[b] :], k8[:, b, :, pos[b] :]
        )
        np.testing.assert_array_equal(
            ks2[:, b, :, : lo], ksc[:, b, :, : lo]
        )
    assert np.asarray(v2).dtype == np.int8
    assert np.asarray(vs2).shape == vsc.shape


def test_decode_loop_ring_matches_manual_flush_loop(monkeypatch):
    """decode_loop's grouped flush schedule must equal a hand-rolled
    step loop that flushes whenever pos crosses a multiple of 8 —
    validates the flush TIMING exactly (kernel numerics are covered by
    the dense-reference test above)."""
    monkeypatch.setenv("QLLM_TPU_FORCE_PALLAS_ATTN", "1")
    from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG as CFG
    from qllm_tpu.models import forward, init_params, prefill
    from qllm_tpu.models.decode_loop import decode_loop
    from qllm_tpu.models.generate import make_cache

    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(11)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 8)), jnp.int32)

    cache = make_cache(CFG, 2, 64, quantized_kv=True, ring=True)
    last, cache0 = prefill(params, CFG, prompt, cache)
    tok0 = jnp.argmax(last, axis=-1).astype(jnp.int32)[:, None]

    toks_loop, cache_loop = decode_loop(
        params, CFG, tok0, cache0, jnp.int32(8), 16
    )

    token, cache, pos = tok0, cache0, 8
    toks_manual = []
    for _ in range(16):
        logits, cache = forward(
            params, CFG, token, cache, pos=jnp.int32(pos)
        )
        token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
        toks_manual.append(np.asarray(token[:, 0]))
        pos += 1
        if pos % RING == 0:
            k2, v2, ks2, vs2 = kv_ring_flush_pallas(
                cache.k,
                cache.v,
                cache.k_scale,
                cache.v_scale,
                cache.ring_k,
                cache.ring_v,
                jnp.full((2,), pos, jnp.int32),
            )
            cache = dataclasses.replace(
                cache, k=k2, v=v2, k_scale=ks2, v_scale=vs2
            )
    np.testing.assert_array_equal(
        np.asarray(toks_loop), np.stack(toks_manual, axis=1)
    )
    # caches agree to the last int8 bit modulo round()-boundary flips
    # (scan vs python-loop compilation may fuse the flush quantization
    # arithmetic differently; observed <=2 of 16k elements off by 1)
    diff = np.abs(
        np.asarray(cache_loop.k).astype(np.int32)
        - np.asarray(cache.k).astype(np.int32)
    )
    assert diff.max() <= 1 and (diff > 0).mean() < 1e-3


def test_decode_loop_ring_close_to_classic(monkeypatch):
    """Ring vs classic per-token-write decode: trajectories agree until
    bf16-vs-int8 noise flips a greedy near-tie; the caches over the
    decoded region stay statistically close."""
    monkeypatch.setenv("QLLM_TPU_FORCE_PALLAS_ATTN", "1")
    from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG as CFG
    from qllm_tpu.models import init_params, prefill
    from qllm_tpu.models.decode_loop import decode_loop
    from qllm_tpu.models.generate import make_cache

    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(11)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 8)), jnp.int32)

    toks = {}
    caches = {}
    for ring in (False, True):
        cache = make_cache(CFG, 2, 64, quantized_kv=True, ring=ring)
        last, cache = prefill(params, CFG, prompt, cache)
        tok0 = jnp.argmax(last, axis=-1).astype(jnp.int32)[:, None]
        toks[ring], caches[ring] = decode_loop(
            params, CFG, tok0, cache, jnp.int32(8), 16
        )
    a, b = np.asarray(toks[True]), np.asarray(toks[False])
    # the two paths quantize the same values (ring just defers it) —
    # expect strong agreement before any near-tie flip
    assert (a == b).mean() > 0.5
    assert (a[:, :4] == b[:, :4]).all()
    # caches agree bit-for-bit over the prefix where tokens agree
    agree = int(np.argmin((a == b).all(axis=0).cumprod()) or a.shape[1])
    if agree > 1:
        ka = np.asarray(caches[True].k[:, :, :, 8 : 8 + agree - 1])
        kb = np.asarray(caches[False].k[:, :, :, 8 : 8 + agree - 1])
        diff = np.abs(ka.astype(np.int32) - kb.astype(np.int32))
        # same values quantized (ring defers it through a bf16 roundtrip)
        assert np.mean(diff) < 1.0


def test_decode_loop_ring_rejects_unaligned_steps(monkeypatch):
    monkeypatch.setenv("QLLM_TPU_FORCE_PALLAS_ATTN", "1")
    from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG as CFG
    from qllm_tpu.models import init_params
    from qllm_tpu.models.decode_loop import decode_loop
    from qllm_tpu.models.generate import make_cache

    params = init_params(CFG, jax.random.key(0))
    cache = make_cache(CFG, 1, 64, quantized_kv=True, ring=True)
    with pytest.raises(ValueError, match="steps % 8"):
        decode_loop(
            params,
            CFG,
            jnp.ones((1, 1), jnp.int32),
            cache,
            jnp.int32(8),
            13,
        )


def test_ring_cache_rejects_xla_fallback_decode():
    from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG as CFG
    from qllm_tpu.models import init_params
    from qllm_tpu.models.generate import decode_step, make_cache

    params = init_params(CFG, jax.random.key(0))
    cache = make_cache(CFG, 1, 64, quantized_kv=True, ring=True)
    # CPU without QLLM_TPU_FORCE_PALLAS_ATTN -> non-kernel path -> must
    # refuse rather than corrupt the cache
    with pytest.raises(NotImplementedError, match="ring-fused"):
        decode_step(
            params, CFG, jnp.ones((1, 1), jnp.int32), cache, jnp.int32(8)
        )
