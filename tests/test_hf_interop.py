"""Interop with real HuggingFace transformers checkpoints.

Builds a tiny random LlamaForCausalLM with transformers (torch CPU),
saves it the HF way, loads it with our loader, and checks logits parity
— the real from_pretrained contract (reference modeling/base.py:189-223).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qllm_tpu.modeling import AutoQuantizedModelForCausalLM as AutoQ  # noqa: E402
from qllm_tpu.models import forward  # noqa: E402


@pytest.fixture(scope="module")
def hf_ckpt(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model = model.eval().to(torch.float32)
    path = tmp_path_factory.mktemp("hf") / "tiny-llama-hf"
    model.save_pretrained(str(path), safe_serialization=True)
    return str(path), model


def test_load_hf_checkpoint_logits_match(hf_ckpt):
    path, hf_model = hf_ckpt
    params, cfg = AutoQ.from_pretrained(path, dtype=jnp.float32)
    assert cfg.num_hidden_layers == 2

    ids = np.array([[3, 17, 42, 99, 7]], np.int64)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = forward(params, cfg, jnp.asarray(ids.astype(np.int32)))
    ours = np.asarray(ours)
    # same argmax everywhere and close logits (bf16 matmuls inside)
    np.testing.assert_array_equal(
        ours.argmax(-1), ref.argmax(-1)
    )
    np.testing.assert_allclose(ours, ref, atol=0.15, rtol=0.05)


def test_quantize_hf_checkpoint_end_to_end(hf_ckpt, tmp_path):
    path, hf_model = hf_ckpt
    from qllm_tpu.args_config import FakeArgs
    from qllm_tpu.auto_quant import AutoModelQuantization

    amq = AutoModelQuantization()
    params, cfg = AutoQ.from_pretrained(path)
    qparams = amq.api_quantize(
        params,
        cfg,
        args=FakeArgs(
            model=path,
            quant_method="gptq",
            wbits=8,
            groupsize=32,
            nsamples=2,
            seqlen=32,
            dataset="synthetic",
        ),
    )
    out = str(tmp_path / "q")
    amq.save_model(
        qparams,
        cfg,
        FakeArgs(model=path, quant_method="gptq", pack_mode="GPTQ"),
        out,
    )
    p2, c2 = AutoQ.from_quantized(out)
    ids = np.array([[5, 9, 33]], np.int32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    ours, _ = forward(p2, c2, jnp.asarray(ids))
    # 8-bit quantization: argmax preserved
    np.testing.assert_array_equal(np.asarray(ours).argmax(-1), ref.argmax(-1))


@pytest.mark.parametrize(
    "arch,extra",
    [
        ("MistralConfig", {}),
        ("Qwen2Config", {}),
    ],
)
def test_load_hf_sibling_archs(tmp_path, arch, extra):
    """Mistral / Qwen2 checkpoints load and match torch logits."""
    cfg_cls = getattr(transformers, arch)
    cfg = cfg_cls(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        tie_word_embeddings=False,
        **extra,
    )
    torch.manual_seed(0)
    model_cls = getattr(transformers, arch.replace("Config", "ForCausalLM"))
    model = model_cls(cfg).eval().to(torch.float32)
    path = str(tmp_path / arch)
    model.save_pretrained(path, safe_serialization=True)

    params, mcfg = AutoQ.from_pretrained(path, dtype=jnp.float32)
    if arch == "Qwen2Config":
        assert mcfg.attention_bias  # qwen2 qkv biases
        assert "q_proj_bias" in params["layers"][0]
    ids = np.array([[3, 17, 42, 99, 7]], np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()
    ours, _ = forward(params, mcfg, jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_array_equal(
        np.asarray(ours).argmax(-1), ref.argmax(-1)
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=0.15, rtol=0.05)
