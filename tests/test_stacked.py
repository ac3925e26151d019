"""Stacked-layer scan execution == unrolled python-loop execution."""

import jax
import jax.numpy as jnp
import numpy as np

from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, init_params
from qllm_tpu.models.generate import decode_step, make_cache, prefill
from qllm_tpu.models.stacked import is_stackable, stack_layer_params
from qllm_tpu.quant.qtensor import quantize_tensor

CFG = TINY_LLAMA_TEST_CONFIG


def _qparams():
    params = init_params(CFG, jax.random.key(0))
    layers = []
    for lp in params["layers"]:
        nlp = dict(lp)
        for n in (
            "q_proj",
            "k_proj",
            "v_proj",
            "o_proj",
            "gate_proj",
            "up_proj",
            "down_proj",
        ):
            nlp[n] = quantize_tensor(lp[n], 4, 32)
        layers.append(nlp)
    return {**params, "layers": layers}


def test_stackable_detection():
    qp = _qparams()
    assert is_stackable(qp)
    sp = stack_layer_params(qp)
    assert not isinstance(sp["layers"], list)
    # q/k/v fuse into one wide stacked tensor by default
    assert sp["layers"]["qkv_proj"].qweight.shape[0] == CFG.num_hidden_layers
    sp2 = stack_layer_params(qp, fuse_projections=False)
    assert sp2["layers"]["q_proj"].qweight.shape[0] == CFG.num_hidden_layers


def test_stacked_prefill_decode_matches_unrolled():
    qp = _qparams()
    sp = stack_layer_params(qp)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 8)), jnp.int32)

    c1 = make_cache(CFG, 2, 16, quantized_kv=True)
    c2 = make_cache(CFG, 2, 16, quantized_kv=True)
    l1, c1 = prefill(qp, CFG, tokens, c1)
    l2, c2 = prefill(sp, CFG, tokens, c2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-2, rtol=2e-2)

    tok = jnp.argmax(l1, axis=-1).astype(jnp.int32)[:, None]
    d1, _ = decode_step(qp, CFG, tok, c1, jnp.int32(8))
    d2, _ = decode_step(sp, CFG, tok, c2, jnp.int32(8))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=2e-2, rtol=2e-2)


def test_stacked_per_slot_positions():
    qp = _qparams()
    sp = stack_layer_params(qp)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 1)), jnp.int32)
    c1 = make_cache(CFG, 2, 16, quantized_kv=True)
    positions = jnp.asarray([3, 7], jnp.int32)
    d1, _ = decode_step(qp, CFG, tokens, c1, positions)
    d2, _ = decode_step(sp, CFG, tokens, c1, positions)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=2e-2, rtol=2e-2)


def test_moe_not_stackable():
    import dataclasses
    import pytest

    from qllm_tpu.models.llama import init_params as ip

    moe_cfg = dataclasses.replace(
        CFG, arch="mixtral", num_local_experts=2, num_experts_per_tok=1
    )
    params = ip(moe_cfg, jax.random.key(0))
    assert not is_stackable(params)
    with pytest.raises(ValueError, match="not stackable"):
        stack_layer_params(params)


def test_unstack_roundtrip_and_save(tmp_path):
    from qllm_tpu.modeling import AutoQuantizedModelForCausalLM as AutoQ
    from qllm_tpu.models.stacked import unstack_layer_params
    import pytest

    qp = _qparams()
    sp = stack_layer_params(qp)
    with pytest.raises(ValueError, match="unstack"):
        AutoQ.save_pretrained(sp, CFG, str(tmp_path / "x"))
    up = unstack_layer_params(sp, CFG.num_hidden_layers, CFG)
    # identical packed bits and logical shapes after the round trip
    np.testing.assert_array_equal(
        np.asarray(up["layers"][1]["q_proj"].qweight),
        np.asarray(qp["layers"][1]["q_proj"].qweight),
    )
    path = str(tmp_path / "ok")
    AutoQ.save_pretrained(up, CFG, path)
    p2, c2 = AutoQ.from_quantized(path)
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    c1 = make_cache(CFG, 1, 8, quantized_kv=False)
    l1, _ = prefill(qp, CFG, tokens, c1)
    l2, _ = prefill(p2, c2, tokens, make_cache(CFG, 1, 8, quantized_kv=False))
    # reload casts dense leaves f32->fp16->bf16 (same budget as the
    # checkpoint round-trip tests)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=6e-2, rtol=6e-2)


def test_prepare_lm_head_l1_stack_matches_dense():
    """prepare_lm_head produces an L=1 stack that ops.qmatmul routes
    through the stacked kernel path (CPU falls back internally) with
    numerics equal to the 2-D tensor."""
    import numpy as np

    from qllm_tpu.models.stacked import prepare_lm_head
    from qllm_tpu.ops.ref_matmul import qmatmul
    from qllm_tpu.quant.qtensor import quantize_tensor

    rng = np.random.default_rng(0)
    K, N, g = 256, 320, 64
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    qt = quantize_tensor(w, bits=4, group_size=g)
    x = jnp.asarray(rng.normal(size=(3, K)).astype(np.float32))

    y2d = qmatmul(x, qt)
    qt1 = prepare_lm_head(qt, scale_store_dtype=jnp.bfloat16)
    assert qt1.qweight.ndim == 3 and qt1.qweight.shape[0] == 1
    assert qt1.out_features == N  # logical width preserved
    y1 = qmatmul(x, qt1)
    assert y1.shape == y2d.shape
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y2d), atol=3e-2, rtol=3e-2
    )


def test_stacked_gemma2_features_match_unrolled():
    """post_norms + attn softcap + attn_scale + qk-norm survive the
    stacked scan path (gemma2/cohere serving)."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG,
        arch="gemma2",
        norm_type="rmsnorm_plus1",
        post_norms=True,
        attn_logit_softcap=30.0,
        final_logit_softcap=15.0,
        attn_scale=0.17,
        qk_norm="cohere",
        residual_multiplier=0.9,
    )
    params = init_params(cfg, jax.random.key(2))
    layers = []
    for lp in params["layers"]:
        nlp = dict(lp)
        for n in ("q_proj", "k_proj", "v_proj", "o_proj",
                  "gate_proj", "up_proj", "down_proj"):
            nlp[n] = quantize_tensor(lp[n], 4, 32)
        layers.append(nlp)
    qp = {**params, "layers": layers}
    sp = stack_layer_params(qp)
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)), jnp.int32)
    c1 = make_cache(cfg, 2, 16, quantized_kv=True)
    c2 = make_cache(cfg, 2, 16, quantized_kv=True)
    l1, c1 = prefill(qp, cfg, tokens, c1)
    l2, c2 = prefill(sp, cfg, tokens, c2)
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l2), atol=2e-2, rtol=2e-2
    )
    tok = jnp.argmax(l1, axis=-1).astype(jnp.int32)[:, None]
    d1, _ = decode_step(qp, cfg, tok, c1, jnp.int32(8))
    d2, _ = decode_step(sp, cfg, tok, c2, jnp.int32(8))
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d2), atol=2e-2, rtol=2e-2
    )


def test_stacked_sliding_window_matches_unrolled():
    """Alternating sliding/global layers (gemma2 pattern) through the
    lax.scan path: prefill BEYOND the window + decode must match the
    per-layer forward (which is HF-parity-tested in test_archs)."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG, arch="gemma2", sliding_window=4, swa_pattern="even"
    )
    params = init_params(cfg, jax.random.key(5))
    layers = []
    for lp in params["layers"]:
        nlp = dict(lp)
        for n in ("q_proj", "k_proj", "v_proj", "o_proj",
                  "gate_proj", "up_proj", "down_proj"):
            nlp[n] = quantize_tensor(lp[n], 4, 32)
        layers.append(nlp)
    qp = {**params, "layers": layers}
    sp = stack_layer_params(qp)
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)), jnp.int32)
    c1 = make_cache(cfg, 2, 32, quantized_kv=True)
    c2 = make_cache(cfg, 2, 32, quantized_kv=True)
    l1, c1 = prefill(qp, cfg, tokens, c1)
    l2, c2 = prefill(sp, cfg, tokens, c2)
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l2), atol=2e-2, rtol=2e-2
    )
    tok = jnp.argmax(l1, axis=-1).astype(jnp.int32)[:, None]
    d1, _ = decode_step(qp, cfg, tok, c1, jnp.int32(12))
    d2, _ = decode_step(sp, cfg, tok, c2, jnp.int32(12))
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d2), atol=2e-2, rtol=2e-2
    )
