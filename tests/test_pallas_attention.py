"""Fused int8-KV decode attention vs the XLA reference (interpret mode)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qllm_tpu.ops.kv_cache import QuantizedKVCache
from qllm_tpu.ops.pallas_attention import decode_attention_pallas


def _ref_attention(q, k, v, lengths):
    """q [B,H,d], k/v [B,H_kv,S,d] float, per-batch lengths."""
    B, H, d = q.shape
    Hkv = k.shape[1]
    n_rep = H // Hkv
    k = np.repeat(k, n_rep, axis=1)
    v = np.repeat(v, n_rep, axis=1)
    scores = np.einsum("bhd,bhsd->bhs", q, k) / np.sqrt(d)
    S = k.shape[2]
    mask = np.arange(S)[None, None, :] < lengths[:, None, None]
    scores = np.where(mask, scores, -np.inf)
    scores -= scores.max(axis=-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(axis=-1, keepdims=True)
    return np.einsum("bhs,bhsd->bhd", p, v)


@pytest.mark.parametrize("n_rep", [1, 2, 4])
def test_decode_attention_matches_reference(n_rep):
    rng = np.random.default_rng(0)
    B, Hkv, S, d = 2, 2, 128, 128
    H = Hkv * n_rep
    q = rng.normal(size=(B, H, d)).astype(np.float32)
    k = (rng.integers(-127, 128, (B, Hkv, S, d))).astype(np.int8)
    v = (rng.integers(-127, 128, (B, Hkv, S, d))).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, (B, Hkv, S)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, (B, Hkv, S)).astype(np.float32)
    lengths = np.array([100, 37], np.int32)

    out = np.asarray(
        decode_attention_pallas(
            jnp.asarray(q),
            jnp.asarray(k),
            jnp.asarray(v),
            jnp.asarray(ks),
            jnp.asarray(vs),
            jnp.asarray(lengths),
        )
    )
    ref = _ref_attention(
        q,
        k.astype(np.float32) * ks[..., None],
        v.astype(np.float32) * vs[..., None],
        lengths,
    )
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_model_decode_with_pallas_attention_matches_xla():
    """Full decode step through the model with the kernel forced on."""
    from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG as CFG
    from qllm_tpu.models import init_params, prefill
    from qllm_tpu.models.generate import decode_step, make_cache

    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 9)), jnp.int32)
    cache = make_cache(CFG, 1, 128, quantized_kv=True)
    last, cache = prefill(params, CFG, tokens[:, :8], cache)

    os.environ["QLLM_TPU_FORCE_PALLAS_ATTN"] = "1"
    try:
        lp, _ = decode_step(
            params, CFG, tokens[:, 8:9], cache, jnp.int32(8)
        )
    finally:
        del os.environ["QLLM_TPU_FORCE_PALLAS_ATTN"]
    lx, _ = decode_step(params, CFG, tokens[:, 8:9], cache, jnp.int32(8))
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(lx), atol=5e-2, rtol=5e-2
    )


@pytest.mark.parametrize("n_rep", [1, 4])
def test_chunked_decode_attention_matches_oneshot(n_rep):
    """Flash-style S-chunked stacked kernel (long-context path) must
    match the one-shot stacked kernel and the float reference."""
    from qllm_tpu.ops.pallas_attention import (
        _decode_attention_stacked,
        _decode_attention_stacked_chunked,
    )

    rng = np.random.default_rng(7)
    L, B, Hkv, S, d = 2, 2, 2, 384, 128
    H = Hkv * n_rep
    q = rng.normal(size=(B, H, d)).astype(np.float32)
    k = rng.integers(-127, 128, (L, B, Hkv, S, d)).astype(np.int8)
    v = rng.integers(-127, 128, (L, B, Hkv, S, d)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, (L, B, Hkv, S)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, (L, B, Hkv, S)).astype(np.float32)
    lengths = np.array([300, 37], np.int32)  # spans + stops mid-chunk
    layer = jnp.int32(1)

    args = (
        jnp.asarray(q),
        jnp.asarray(k),
        jnp.asarray(v),
        jnp.asarray(ks),
        jnp.asarray(vs),
        jnp.asarray(lengths),
        layer,
    )
    chunked = np.asarray(_decode_attention_stacked_chunked(*args, bs=128))
    oneshot = np.asarray(_decode_attention_stacked(*args))
    np.testing.assert_allclose(chunked, oneshot, atol=2e-2, rtol=2e-2)
    ref = _ref_attention(
        q,
        k[1].astype(np.float32) * ks[1][..., None],
        v[1].astype(np.float32) * vs[1][..., None],
        lengths,
    )
    np.testing.assert_allclose(chunked, ref, atol=2e-2, rtol=2e-2)


def test_long_context_dispatch_routes_to_chunked(monkeypatch):
    """decode_attention_pallas must stream (not one-shot) past the
    VMEM one-shot limit; numerics identical either way."""
    monkeypatch.setenv("QLLM_TPU_ATTN_ONESHOT_S", "128")
    rng = np.random.default_rng(9)
    L, B, Hkv, S, d, n_rep = 2, 1, 2, 256, 128, 2
    H = Hkv * n_rep
    q = rng.normal(size=(B, H, d)).astype(np.float32)
    k = rng.integers(-127, 128, (L, B, Hkv, S, d)).astype(np.int8)
    v = rng.integers(-127, 128, (L, B, Hkv, S, d)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, (L, B, Hkv, S)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, (L, B, Hkv, S)).astype(np.float32)
    lengths = np.array([200], np.int32)
    out = np.asarray(
        decode_attention_pallas(
            jnp.asarray(q),
            jnp.asarray(k),
            jnp.asarray(v),
            jnp.asarray(ks),
            jnp.asarray(vs),
            jnp.asarray(lengths),
            layer=jnp.int32(0),
        )
    )
    ref = _ref_attention(
        q,
        k[0].astype(np.float32) * ks[0][..., None],
        v[0].astype(np.float32) * vs[0][..., None],
        lengths,
    )
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_kv_write_kernel_matches_cache_update():
    """kv_cache_write_pallas (buffer-aliased window writes) must leave
    cache contents IDENTICAL to cache.update's dynamic_update_slice
    path — the write kernel replaces it on the serving hot path."""
    from qllm_tpu.ops.pallas_attention import kv_cache_write_pallas

    rng = np.random.default_rng(3)
    L, B, Hkv, S, d, n_rep = 3, 2, 2, 64, 128, 2
    H = Hkv * n_rep
    layer, pos = 1, np.array([13, 29], np.int32)

    cache = QuantizedKVCache.create(L, B, S, Hkv, d, quantized=True)
    hist_k = rng.normal(size=(B, int(pos.min()), Hkv, d)).astype(np.float32)
    hist_v = rng.normal(size=(B, int(pos.min()), Hkv, d)).astype(np.float32)
    cache = cache.update(layer, jnp.asarray(hist_k), jnp.asarray(hist_v), jnp.int32(0))

    q = rng.normal(size=(B, H, d)).astype(np.float32)
    k_new = rng.normal(size=(B, Hkv, d)).astype(np.float32)
    v_new = rng.normal(size=(B, Hkv, d)).astype(np.float32)

    ref_cache = cache.update(
        layer,
        jnp.asarray(k_new[:, None]),
        jnp.asarray(v_new[:, None]),
        jnp.asarray(pos),
    )
    k2, v2, ks2, vs2 = kv_cache_write_pallas(
        jnp.asarray(k_new),
        jnp.asarray(v_new),
        cache.k,
        cache.v,
        cache.k_scale,
        cache.v_scale,
        jnp.int32(layer),
        jnp.asarray(pos),
    )
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(ref_cache.k))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(ref_cache.v))
    np.testing.assert_allclose(
        np.asarray(ks2), np.asarray(ref_cache.k_scale), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(vs2), np.asarray(ref_cache.v_scale), rtol=1e-6
    )
    # attention over the written cache == attention over the DUS cache
    out = np.asarray(
        decode_attention_pallas(
            jnp.asarray(q), k2, v2, ks2, vs2, jnp.asarray(pos + 1),
            layer=jnp.int32(layer),
        )
    )
    ref_out = np.asarray(
        decode_attention_pallas(
            jnp.asarray(q),
            ref_cache.k,
            ref_cache.v,
            ref_cache.k_scale,
            ref_cache.v_scale,
            jnp.asarray(pos + 1),
            layer=jnp.int32(layer),
        )
    )
    np.testing.assert_array_equal(out, ref_out)

def test_decode_loop_fused_kv_matches_unfused(monkeypatch):
    """End-to-end greedy decode: fused KV path vs cache.update path."""
    import jax as _jax

    from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG as CFG
    from qllm_tpu.models.decode_loop import decode_loop
    from qllm_tpu.models.generate import make_cache
    from qllm_tpu.utils.testing import random_quantized_params

    params = random_quantized_params(CFG, _jax.random.key(2), bits=4, group_size=32)
    token = jnp.ones((1, 1), jnp.int32)
    monkeypatch.setenv("QLLM_TPU_FORCE_PALLAS_ATTN", "1")

    monkeypatch.setenv("QLLM_TPU_FUSED_KV", "0")
    cache = make_cache(CFG, 1, 64, quantized_kv=True)
    t0, _ = decode_loop(params, CFG, token, cache, jnp.int32(0), 8)
    t0 = np.asarray(t0)

    # the env var is read at trace time — drop the cached trace so the
    # second run really takes the fused path
    _jax.clear_caches()
    monkeypatch.setenv("QLLM_TPU_FUSED_KV", "1")
    cache = make_cache(CFG, 1, 64, quantized_kv=True)
    t1, _ = decode_loop(params, CFG, token, cache, jnp.int32(0), 8)
    np.testing.assert_array_equal(t0, np.asarray(t1))


def _ref_prefill(q, k, v, pos, n_rep):
    """Causal-with-offset reference: key s visible to query t iff
    s <= pos[b] + t (matches models.llama.build_mask)."""
    B, T, H, d = q.shape
    S = k.shape[1]
    kk = np.repeat(k, n_rep, axis=2)
    vv = np.repeat(v, n_rep, axis=2)
    logits = np.einsum("bthd,bshd->bhts", q, kk) / np.sqrt(d)
    t = np.arange(T)[:, None]
    s = np.arange(S)[None, :]
    out = np.zeros((B, T, H, d), np.float32)
    for b in range(B):
        m = np.where(s <= pos[b] + t, 0.0, -np.inf)
        lg = logits[b] + m
        p = np.exp(lg - lg.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        out[b] = np.einsum("hts,shd->thd", p, vv[b])
    return out


@pytest.mark.parametrize(
    "B,T,S,Hkv,n_rep,pos",
    [
        (2, 64, 64, 2, 1, [0, 0]),
        (1, 100, 100, 2, 4, [0]),  # T, S not block multiples (padding)
        (2, 16, 160, 2, 2, [100, 37]),  # cache-style offsets, S > T
    ],
)
def test_flash_prefill_matches_reference(B, T, S, Hkv, n_rep, pos):
    from qllm_tpu.ops.pallas_attention import prefill_attention_flash

    rng = np.random.default_rng(3)
    H, d = Hkv * n_rep, 128
    q = rng.normal(size=(B, T, H, d)).astype(np.float32)
    k = rng.normal(size=(B, S, Hkv, d)).astype(np.float32)
    v = rng.normal(size=(B, S, Hkv, d)).astype(np.float32)
    out = np.asarray(
        prefill_attention_flash(
            jnp.asarray(q),
            jnp.asarray(k),
            jnp.asarray(v),
            jnp.asarray(pos, jnp.int32),
            n_rep,
        )
    )
    ref = _ref_prefill(q, k, v, pos, n_rep)
    np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)


def test_model_prefill_with_flash_matches_xla(monkeypatch):
    """Full model prefill with the flash path forced on vs the XLA
    mask-based path — logits must agree."""
    from qllm_tpu.models.llama import ModelConfig, forward, init_params
    from qllm_tpu.models.generate import make_cache

    cfg = ModelConfig(
        vocab_size=512,
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=2,  # hd = 128 (flash gate needs 128-lane heads)
        num_key_value_heads=2,
        max_position_embeddings=256,
    )
    params = init_params(cfg, jax.random.key(2))
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 48)), jnp.int32)

    lx, _ = forward(params, cfg, tokens, None, pos=None)

    monkeypatch.setenv("QLLM_TPU_FORCE_PALLAS_ATTN", "1")
    monkeypatch.setenv("QLLM_TPU_PREFILL_FLASH_MIN_T", "8")
    lf, _ = forward(params, cfg, tokens, None, pos=None)
    np.testing.assert_allclose(
        np.asarray(lf), np.asarray(lx), atol=5e-2, rtol=5e-2
    )

    # cache-prefill route (chunked admission): T > 1 with a cache
    cache = make_cache(cfg, 2, 64, quantized_kv=False)
    lc, _ = forward(params, cfg, tokens, cache, pos=jnp.int32(0))
    monkeypatch.delenv("QLLM_TPU_FORCE_PALLAS_ATTN")
    monkeypatch.delenv("QLLM_TPU_PREFILL_FLASH_MIN_T")
    lc_ref, _ = forward(params, cfg, tokens, cache, pos=jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(lc), np.asarray(lc_ref), atol=5e-2, rtol=5e-2
    )


def test_decode_attention_softcap_matches_reference():
    """gemma2 logit soft-capping (cap*tanh(logits/cap) before the mask)
    inside the decode kernel vs a numpy reference."""
    rng = np.random.default_rng(5)
    B, Hkv, S, d, n_rep, cap = 2, 2, 128, 128, 2, 30.0
    H = Hkv * n_rep
    q = rng.normal(size=(B, H, d)).astype(np.float32)
    k = rng.integers(-127, 128, (B, Hkv, S, d)).astype(np.int8)
    v = rng.integers(-127, 128, (B, Hkv, S, d)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, (B, Hkv, S)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, (B, Hkv, S)).astype(np.float32)
    lengths = np.array([100, 37], np.int32)

    out = np.asarray(
        decode_attention_pallas(
            jnp.asarray(q),
            jnp.asarray(k),
            jnp.asarray(v),
            jnp.asarray(ks),
            jnp.asarray(vs),
            jnp.asarray(lengths),
            softcap=cap,
        )
    )
    kf = k.astype(np.float32) * ks[..., None]
    vf = v.astype(np.float32) * vs[..., None]
    kk = np.repeat(kf, n_rep, axis=1)
    vv = np.repeat(vf, n_rep, axis=1)
    scores = np.einsum("bhd,bhsd->bhs", q, kk) / np.sqrt(d)
    scores = cap * np.tanh(scores / cap)
    mask = np.arange(S)[None, None, :] < lengths[:, None, None]
    scores = np.where(mask, scores, -np.inf)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhs,bhsd->bhd", p, vv)
    np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)


def test_flash_prefill_softcap_matches_reference():
    from qllm_tpu.ops.pallas_attention import prefill_attention_flash

    rng = np.random.default_rng(6)
    B, T, S, Hkv, n_rep, d, cap = 1, 100, 100, 2, 2, 128, 30.0
    H = Hkv * n_rep
    q = rng.normal(size=(B, T, H, d)).astype(np.float32)
    k = rng.normal(size=(B, S, Hkv, d)).astype(np.float32)
    v = rng.normal(size=(B, S, Hkv, d)).astype(np.float32)
    pos = [0]
    out = np.asarray(
        prefill_attention_flash(
            jnp.asarray(q),
            jnp.asarray(k),
            jnp.asarray(v),
            jnp.asarray(pos, jnp.int32),
            n_rep,
            softcap=cap,
        )
    )
    kk = np.repeat(k, n_rep, axis=2)
    vv = np.repeat(v, n_rep, axis=2)
    logits = np.einsum("bthd,bshd->bhts", q, kk) / np.sqrt(d)
    logits = cap * np.tanh(logits / cap)
    t = np.arange(T)[:, None]
    s = np.arange(S)[None, :]
    ref = np.zeros((B, T, H, d), np.float32)
    for b in range(B):
        m = np.where(s <= pos[b] + t, 0.0, -np.inf)
        lg = logits[b] + m
        p = np.exp(lg - lg.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref[b] = np.einsum("hts,shd->thd", p, vv[b])
    np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("n_rep", [1, 2])
def test_decode_attention_alibi_matches_reference(n_rep):
    """bloom/mpt ALiBi bias (key-position form slopes[h]*s, matching
    build_mask) inside the decode kernel vs a numpy reference."""
    from qllm_tpu.models.llama import alibi_slopes

    rng = np.random.default_rng(7)
    B, Hkv, S, d = 2, 4, 128, 128
    H = Hkv * n_rep
    sl = np.asarray(alibi_slopes(H), np.float32)
    q = rng.normal(size=(B, H, d)).astype(np.float32)
    k = rng.integers(-127, 128, (B, Hkv, S, d)).astype(np.int8)
    v = rng.integers(-127, 128, (B, Hkv, S, d)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, (B, Hkv, S)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, (B, Hkv, S)).astype(np.float32)
    lengths = np.array([100, 37], np.int32)

    out = np.asarray(
        decode_attention_pallas(
            jnp.asarray(q),
            jnp.asarray(k),
            jnp.asarray(v),
            jnp.asarray(ks),
            jnp.asarray(vs),
            jnp.asarray(lengths),
            alibi_slopes=jnp.asarray(sl),
        )
    )
    kf = k.astype(np.float32) * ks[..., None]
    vf = v.astype(np.float32) * vs[..., None]
    kk = np.repeat(kf, n_rep, axis=1)
    vv = np.repeat(vf, n_rep, axis=1)
    scores = np.einsum("bhd,bhsd->bhs", q, kk) / np.sqrt(d)
    scores = scores + sl[None, :, None] * np.arange(S, dtype=np.float32)
    mask = np.arange(S)[None, None, :] < lengths[:, None, None]
    scores = np.where(mask, scores, -np.inf)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhs,bhsd->bhd", p, vv)
    np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)


def test_model_alibi_decode_kernel_matches_xla(monkeypatch):
    """A bloom-style model's decode step: Pallas kernel path vs the XLA
    mask path produce the same logits."""
    import dataclasses

    from qllm_tpu.models.llama import (
        TINY_LLAMA_TEST_CONFIG,
        forward,
        init_params,
    )
    from qllm_tpu.models.generate import make_cache

    cfg = dataclasses.replace(
        TINY_LLAMA_TEST_CONFIG,
        pos_embedding="alibi",
        num_attention_heads=4,
        num_key_value_heads=4,
        head_dim=128,
        hidden_size=512,
        intermediate_size=256,
    )
    params = init_params(cfg, jax.random.key(2))
    tok = jnp.asarray([[5]], jnp.int32)

    def decode_logits():
        cache = make_cache(cfg, 1, 16, quantized_kv=True)
        lg, cache = forward(params, cfg, jnp.asarray([[3]]), cache, pos=jnp.int32(0))
        lg, _ = forward(params, cfg, tok, cache, pos=jnp.int32(1))
        return np.asarray(lg[0, -1], np.float32)

    monkeypatch.setenv("QLLM_TPU_DISABLE_PALLAS", "1")
    ref = decode_logits()
    monkeypatch.delenv("QLLM_TPU_DISABLE_PALLAS")
    monkeypatch.setenv("QLLM_TPU_FORCE_PALLAS_ATTN", "1")
    out = decode_logits()
    rel = np.linalg.norm(out - ref) / max(np.linalg.norm(ref), 1e-9)
    assert rel < 2e-2, rel


def test_decode_attention_window_matches_reference():
    """Sliding-window masking in the decode kernel (keys s with
    length-1-s < window) vs a numpy reference."""
    rng = np.random.default_rng(8)
    B, Hkv, S, d, n_rep, W = 2, 2, 128, 128, 2, 16
    H = Hkv * n_rep
    q = rng.normal(size=(B, H, d)).astype(np.float32)
    k = rng.integers(-127, 128, (B, Hkv, S, d)).astype(np.int8)
    v = rng.integers(-127, 128, (B, Hkv, S, d)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, (B, Hkv, S)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, (B, Hkv, S)).astype(np.float32)
    lengths = np.array([100, 37], np.int32)

    out = np.asarray(
        decode_attention_pallas(
            jnp.asarray(q),
            jnp.asarray(k),
            jnp.asarray(v),
            jnp.asarray(ks),
            jnp.asarray(vs),
            jnp.asarray(lengths),
            window=jnp.int32(W),
        )
    )
    kf = k.astype(np.float32) * ks[..., None]
    vf = v.astype(np.float32) * vs[..., None]
    kk = np.repeat(kf, n_rep, axis=1)
    vv = np.repeat(vf, n_rep, axis=1)
    scores = np.einsum("bhd,bhsd->bhs", q, kk) / np.sqrt(d)
    s_idx = np.arange(S)[None, None, :]
    ln = lengths[:, None, None]
    mask = (s_idx < ln) & (s_idx >= ln - W)
    scores = np.where(mask, scores, -np.inf)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhs,bhsd->bhd", p, vv)
    np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)


def test_model_swa_decode_kernel_matches_xla(monkeypatch):
    """Mistral-style (all-layer SWA) and gemma2-style (alternating)
    decode: the windowed kernel path matches the masked XLA path, at a
    position BEYOND the window."""
    import dataclasses

    from qllm_tpu.models.llama import (
        TINY_LLAMA_TEST_CONFIG,
        forward,
        init_params,
    )
    from qllm_tpu.models.generate import make_cache

    for pattern in ("all", "even"):
        cfg = dataclasses.replace(
            TINY_LLAMA_TEST_CONFIG,
            num_attention_heads=4,
            num_key_value_heads=4,
            head_dim=128,
            hidden_size=512,
            intermediate_size=256,
            sliding_window=4,
            swa_pattern=pattern,
        )
        params = init_params(cfg, jax.random.key(4))
        prompt = jnp.asarray([[3, 5, 7, 9, 11, 2]], jnp.int32)  # T=6 > W=4

        def decode_logits():
            cache = make_cache(cfg, 1, 16, quantized_kv=True)
            lg, cache = forward(params, cfg, prompt, cache, pos=jnp.int32(0))
            lg, _ = forward(
                params, cfg, jnp.asarray([[4]]), cache, pos=jnp.int32(6)
            )
            return np.asarray(lg[0, -1], np.float32)

        monkeypatch.setenv("QLLM_TPU_DISABLE_PALLAS", "1")
        ref = decode_logits()
        monkeypatch.delenv("QLLM_TPU_DISABLE_PALLAS")
        monkeypatch.setenv("QLLM_TPU_FORCE_PALLAS_ATTN", "1")
        out = decode_logits()
        monkeypatch.delenv("QLLM_TPU_FORCE_PALLAS_ATTN")
        rel = np.linalg.norm(out - ref) / max(np.linalg.norm(ref), 1e-9)
        assert rel < 2e-2, (pattern, rel)


def test_flash_prefill_window_matches_reference():
    """Sliding-window masking in the flash prefill kernel vs numpy."""
    from qllm_tpu.ops.pallas_attention import prefill_attention_flash

    rng = np.random.default_rng(9)
    B, T, S, Hkv, n_rep, d, W = 2, 100, 160, 2, 2, 128, 24
    H = Hkv * n_rep
    q = rng.normal(size=(B, T, H, d)).astype(np.float32)
    k = rng.normal(size=(B, S, Hkv, d)).astype(np.float32)
    v = rng.normal(size=(B, S, Hkv, d)).astype(np.float32)
    pos = [60, 37]  # cache-style offsets
    out = np.asarray(
        prefill_attention_flash(
            jnp.asarray(q),
            jnp.asarray(k),
            jnp.asarray(v),
            jnp.asarray(pos, jnp.int32),
            n_rep,
            window=jnp.int32(W),
        )
    )
    kk = np.repeat(k, n_rep, axis=2)
    vv = np.repeat(v, n_rep, axis=2)
    logits = np.einsum("bthd,bshd->bhts", q, kk) / np.sqrt(d)
    t = np.arange(T)[:, None]
    s = np.arange(S)[None, :]
    ref = np.zeros((B, T, H, d), np.float32)
    for b in range(B):
        rowpos = pos[b] + t
        keep = (s <= rowpos) & (s > rowpos - W)
        m = np.where(keep, 0.0, -np.inf)
        lg = logits[b] + m
        p = np.exp(lg - lg.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref[b] = np.einsum("hts,shd->thd", p, vv[b])
    np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)


def test_model_swa_prefill_flash_matches_xla(monkeypatch):
    """SWA model prefill (T > window): flash kernel path vs the masked
    XLA path, for both 'all' and 'even' patterns."""
    import dataclasses

    from qllm_tpu.models.llama import (
        TINY_LLAMA_TEST_CONFIG,
        forward,
        init_params,
    )
    from qllm_tpu.models.generate import make_cache

    monkeypatch.setenv("QLLM_TPU_PREFILL_FLASH_MIN_T", "8")
    for pattern in ("all", "even"):
        cfg = dataclasses.replace(
            TINY_LLAMA_TEST_CONFIG,
            num_attention_heads=4,
            num_key_value_heads=4,
            head_dim=128,
            hidden_size=512,
            intermediate_size=256,
            sliding_window=4,
            swa_pattern=pattern,
        )
        params = init_params(cfg, jax.random.key(6))
        rng = np.random.default_rng(11)
        prompt = jnp.asarray(
            rng.integers(1, cfg.vocab_size, (1, 12)), jnp.int32
        )

        def prefill_logits():
            cache = make_cache(cfg, 1, 16, quantized_kv=True)
            lg, _ = forward(params, cfg, prompt, cache, pos=jnp.int32(0))
            return np.asarray(lg[0, -1], np.float32)

        monkeypatch.setenv("QLLM_TPU_DISABLE_PALLAS", "1")
        ref = prefill_logits()
        monkeypatch.delenv("QLLM_TPU_DISABLE_PALLAS")
        monkeypatch.setenv("QLLM_TPU_FORCE_PALLAS_ATTN", "1")
        out = prefill_logits()
        monkeypatch.delenv("QLLM_TPU_FORCE_PALLAS_ATTN")
        rel = np.linalg.norm(out - ref) / max(np.linalg.norm(ref), 1e-9)
        assert rel < 2e-2, (pattern, rel)


def test_chunked_decode_window_matches_oneshot(monkeypatch):
    """Long-context path: the chunked kernel's sliding window (with
    whole-chunk skipping) matches the one-shot windowed kernel."""
    rng = np.random.default_rng(12)
    L, B, Hkv, S, d, n_rep, W = 2, 1, 2, 512, 128, 2, 100
    H = Hkv * n_rep
    q = rng.normal(size=(B, H, d)).astype(np.float32)
    k = rng.integers(-127, 128, (L, B, Hkv, S, d)).astype(np.int8)
    v = rng.integers(-127, 128, (L, B, Hkv, S, d)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, (L, B, Hkv, S)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, (L, B, Hkv, S)).astype(np.float32)
    lengths = np.array([300], np.int32)
    args = [jnp.asarray(a) for a in (q, k, v, ks, vs, lengths)]

    one_shot = np.asarray(
        decode_attention_pallas(
            *args, layer=jnp.int32(1), window=jnp.int32(W)
        )
    )
    monkeypatch.setenv("QLLM_TPU_ATTN_ONESHOT_S", "256")  # force chunked
    chunked = np.asarray(
        decode_attention_pallas(
            *args, layer=jnp.int32(1), window=jnp.int32(W)
        )
    )
    np.testing.assert_allclose(chunked, one_shot, atol=3e-3, rtol=3e-3)


@pytest.mark.parametrize("force_bs", [0, 128])  # 0: single-kv-step; 128: ns>1
def test_flash_prefill_int8_native_matches_dequant(monkeypatch, force_bs):
    """The cached-prefill int8 path (kv_native + kv_scales: the kernel
    reads the raw cache tensors and folds the per-key scales into score
    columns / probs) must match the dequantize-then-flash path on the
    SAME quantized cache contents — both attend over identical values,
    so only bf16 rounding separates them."""
    from qllm_tpu.ops.pallas_attention import prefill_attention_flash

    if force_bs:
        monkeypatch.setenv("QLLM_TPU_FLASH_BS", str(force_bs))
    B, T, S, Hkv, n_rep, d = 2, 64, 256, 2, 2, 128
    H = Hkv * n_rep
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(B, T, H, d)), jnp.float32)
    k8 = jnp.asarray(rng.integers(-127, 128, (B, Hkv, S, d)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (B, Hkv, S, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (B, Hkv, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (B, Hkv, S)), jnp.float32)
    pos = jnp.asarray([100, 37], jnp.int32)

    out8 = prefill_attention_flash(
        q, k8, v8, pos, n_rep, kv_native=True, kv_scales=(ks, vs)
    )
    kf = (k8.astype(jnp.float32) * ks[..., None]).transpose(0, 2, 1, 3)
    vf = (v8.astype(jnp.float32) * vs[..., None]).transpose(0, 2, 1, 3)
    ref = prefill_attention_flash(q, kf, vf, pos, n_rep)
    np.testing.assert_allclose(
        np.asarray(out8), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


def test_model_cached_prefill_int8_flash_matches_xla(monkeypatch):
    """Full-model chunked-admission prefill (T>1 with a QUANTIZED cache)
    through the int8-native flash route vs the XLA mask path on the
    same cache — logits must agree."""
    from qllm_tpu.models.llama import ModelConfig, forward, init_params
    from qllm_tpu.models.generate import make_cache

    cfg = ModelConfig(
        vocab_size=512,
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=256,
    )
    params = init_params(cfg, jax.random.key(2))
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 48)), jnp.int32)

    cache = make_cache(cfg, 2, 64, quantized_kv=True)
    monkeypatch.setenv("QLLM_TPU_FORCE_PALLAS_ATTN", "1")
    monkeypatch.setenv("QLLM_TPU_PREFILL_FLASH_MIN_T", "8")
    lc, _ = forward(params, cfg, tokens, cache, pos=jnp.int32(0))
    monkeypatch.delenv("QLLM_TPU_FORCE_PALLAS_ATTN")
    monkeypatch.delenv("QLLM_TPU_PREFILL_FLASH_MIN_T")
    lc_ref, _ = forward(params, cfg, tokens, cache, pos=jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(lc), np.asarray(lc_ref), atol=5e-2, rtol=5e-2
    )
