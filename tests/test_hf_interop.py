"""Interop with real HuggingFace transformers checkpoints.

Builds a tiny random LlamaForCausalLM with transformers (torch CPU),
saves it the HF way, loads it with our loader, and checks logits parity
— the real from_pretrained contract (reference modeling/base.py:189-223).
"""

import os

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


def test_unknown_arch_llama_shaped_fallback(tmp_path):
    """Unknown architectures[0] whose config + tensors walk like a llama
    load via the generic fallback with a warning (reference behavior:
    sequential_layes_gptq_config.py:153-173 auto-detects unlisted
    models by module-name prefix instead of hard-failing)."""
    import json

    import jax

    from qllm_tpu.modeling.auto import AutoQuantizedModelForCausalLM as AutoQ
    from qllm_tpu.modeling.auto import _st_save
    from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG as CFG
    from qllm_tpu.models import forward, init_params
    from qllm_tpu.models.generate import make_cache

    params = init_params(CFG, jax.random.key(3))
    lin = {
        "q_proj": "self_attn.q_proj",
        "k_proj": "self_attn.k_proj",
        "v_proj": "self_attn.v_proj",
        "o_proj": "self_attn.o_proj",
        "gate_proj": "mlp.gate_proj",
        "up_proj": "mlp.up_proj",
        "down_proj": "mlp.down_proj",
    }
    # nonstandard root prefix AND unknown arch string
    tensors = {
        "frob.backbone.embed_tokens.weight": np.asarray(
            params["embed_tokens"], np.float16
        ),
        "frob.backbone.norm.weight": np.asarray(params["norm"], np.float16),
        "lm_head.weight": np.asarray(params["lm_head"], np.float16).T,
    }
    for i, lp in enumerate(params["layers"]):
        base = f"frob.backbone.layers.{i}"
        for ours, hf in lin.items():
            tensors[f"{base}.{hf}.weight"] = np.asarray(
                lp[ours], np.float16
            ).T
        tensors[f"{base}.input_layernorm.weight"] = np.asarray(
            lp["input_layernorm"], np.float16
        )
        tensors[f"{base}.post_attention_layernorm.weight"] = np.asarray(
            lp["post_attention_layernorm"], np.float16
        )
    path = str(tmp_path / "frob")
    os.makedirs(path)
    _st_save(tensors, path)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(
            {
                "architectures": ["FrobnicatorForCausalLM"],
                "model_type": "frobnicator",
                "vocab_size": CFG.vocab_size,
                "hidden_size": CFG.hidden_size,
                "intermediate_size": CFG.intermediate_size,
                "num_hidden_layers": CFG.num_hidden_layers,
                "num_attention_heads": CFG.num_attention_heads,
                "num_key_value_heads": CFG.num_key_value_heads,
                "rms_norm_eps": CFG.rms_norm_eps,
            },
            f,
        )
    loaded, cfg = AutoQ.from_pretrained(path, dtype=jnp.float32)
    assert len(loaded["layers"]) == CFG.num_hidden_layers
    tok = jnp.asarray(np.arange(8)[None], jnp.int32)
    cache = make_cache(cfg, 1, 32, False)
    got, _ = forward(loaded, cfg, tok, cache, pos=jnp.int32(0))
    ref, _ = forward(params, cfg, tok, make_cache(cfg, 1, 32, False), pos=jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=0.05, rtol=0.05
    )


def test_unknown_arch_not_llama_shaped_still_raises(tmp_path):
    from qllm_tpu.modeling.archs import spec_for_config

    with pytest.raises(NotImplementedError):
        spec_for_config(
            {"architectures": ["TotallyNovelSSM"], "d_model": 64}
        )
