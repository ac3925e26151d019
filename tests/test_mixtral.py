"""Mixtral (MoE) support: forward, HQQ quantize, checkpoints, HF parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, forward, init_params
from qllm_tpu.quant.config import HQQConfig
from qllm_tpu.quant.hqq import HQQQuantizer

MOE_CFG = dataclasses.replace(
    TINY_LLAMA_TEST_CONFIG,
    arch="mixtral",
    num_local_experts=4,
    num_experts_per_tok=2,
)


def test_moe_forward_and_generate():
    params = init_params(MOE_CFG, jax.random.key(0))
    assert len(params["layers"][0]["experts"]) == 4
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    logits, _ = forward(params, MOE_CFG, tokens)
    assert logits.shape == (1, 4, MOE_CFG.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))

    from qllm_tpu.models import greedy_generate

    out = greedy_generate(params, MOE_CFG, tokens, max_new_tokens=4)
    assert out.shape == (1, 8)


def test_moe_router_topk_selects_experts():
    # single token routed: output must equal weighted sum of top-k experts
    params = init_params(MOE_CFG, jax.random.key(1))
    from qllm_tpu.models.llama import _mlp_forward

    x = jax.random.normal(jax.random.key(2), (1, 1, MOE_CFG.hidden_size))
    lp = params["layers"][0]
    y = _mlp_forward(lp, MOE_CFG, x)
    logits = np.asarray(
        jnp.dot(x.astype(jnp.float32), lp["router"].astype(jnp.float32))
    )[0, 0]
    top2 = np.argsort(-logits)[:2]
    w = np.exp(logits[top2] - logits[top2].max())
    w /= w.sum()

    def expert_out(e):
        ep = lp["experts"][e]
        from qllm_tpu.models.llama import apply_linear

        g = apply_linear(ep["gate_proj"], x)
        u = apply_linear(ep["up_proj"], x)
        return apply_linear(ep["down_proj"], jax.nn.silu(g) * u)

    ref = sum(w[i] * np.asarray(expert_out(e)) for i, e in enumerate(top2))
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-2, rtol=2e-2)


def test_moe_hqq_quantize_and_checkpoint(tmp_path):
    from qllm_tpu.modeling import AutoQuantizedModelForCausalLM as AutoQ
    from qllm_tpu.quant.qtensor import QuantizedTensor

    params = init_params(MOE_CFG, jax.random.key(3))
    qparams = HQQQuantizer(HQQConfig(wbits=4, groupsize=32)).quantize(
        params, MOE_CFG, progress=False
    )
    assert isinstance(
        qparams["layers"][0]["experts"][1]["up_proj"], QuantizedTensor
    )
    # router stays dense
    assert not isinstance(qparams["layers"][0]["router"], QuantizedTensor)

    path = str(tmp_path / "moe_hqq")
    AutoQ.save_pretrained(
        qparams, MOE_CFG, path, pack_mode="HQQ", quant_method="hqq"
    )
    p2, c2 = AutoQ.from_quantized(path)
    assert c2.num_local_experts == 4
    assert isinstance(
        p2["layers"][0]["experts"][2]["down_proj"], QuantizedTensor
    )
    tok = jnp.asarray([[1, 2, 3]], jnp.int32)
    l1, _ = forward(qparams, MOE_CFG, tok)
    l2, _ = forward(p2, c2, tok)
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l2), atol=5e-2, rtol=5e-2
    )




def test_hf_mixtral_interop(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from qllm_tpu.modeling import AutoQuantizedModelForCausalLM as AutoQ

    cfg = transformers.MixtralConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    model = transformers.MixtralForCausalLM(cfg).eval().to(torch.float32)
    path = str(tmp_path / "hf-mixtral")
    model.save_pretrained(path, safe_serialization=True)

    params, mcfg = AutoQ.from_pretrained(path, dtype=jnp.float32)
    assert mcfg.num_local_experts == 4
    ids = np.array([[3, 17, 42, 99]], np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = forward(params, mcfg, jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_array_equal(
        np.asarray(ours).argmax(-1), ref.argmax(-1)
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=0.2, rtol=0.08)


def test_moe_gptq_quantize():
    from qllm_tpu.quant.config import GPTQConfig
    from qllm_tpu.quant.gptq import GPTQQuantizer
    from qllm_tpu.quant.qtensor import QuantizedTensor

    params = init_params(MOE_CFG, jax.random.key(5))
    rng = np.random.default_rng(6)
    calib = jnp.asarray(rng.integers(0, MOE_CFG.vocab_size, (2, 16)), jnp.int32)
    q = GPTQQuantizer(GPTQConfig(wbits=4, groupsize=32))
    qparams = q.quantize(params, MOE_CFG, calib, progress=False)
    assert isinstance(
        qparams["layers"][0]["experts"][0]["down_proj"], QuantizedTensor
    )
    assert "model.layers.0.experts.3.gate_proj" in q.quant_config_by_layer
    logits, _ = forward(qparams, MOE_CFG, calib[:1, :8])
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_moe_awq_quantize():
    from qllm_tpu.quant.awq import AWQQuantizer
    from qllm_tpu.quant.config import AWQConfig
    from qllm_tpu.quant.qtensor import QuantizedTensor

    params = init_params(MOE_CFG, jax.random.key(7))
    rng = np.random.default_rng(8)
    calib = jnp.asarray(rng.integers(0, MOE_CFG.vocab_size, (2, 16)), jnp.int32)
    q = AWQQuantizer(AWQConfig(wbits=4, groupsize=32))
    qparams = q.quantize(params, MOE_CFG, calib, progress=False)
    assert isinstance(
        qparams["layers"][1]["experts"][2]["up_proj"], QuantizedTensor
    )
    logits, _ = forward(qparams, MOE_CFG, calib[:1, :8])
    assert bool(jnp.all(jnp.isfinite(logits)))
