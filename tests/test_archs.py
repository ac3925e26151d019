"""Per-architecture HF interop: tiny random transformers checkpoints ->
our loader -> logits parity vs torch, for every family in
modeling.archs that transformers ships (the breadth contract of the
reference's per-arch tables, sequential_layes_gptq_config.py:4-150).

Fused-qkv dialects (bloom/neox/falcon/gpt2/mpt/bigcode/phi3/codegen)
exercise the exact column-split path; quantize->save->reload round
trips exercise fused re-export (modeling/auto.py put_fused).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from qllm_tpu.modeling import AutoQuantizedModelForCausalLM as AutoQ  # noqa: E402
from qllm_tpu.models import forward  # noqa: E402

TINY = dict(vocab_size=128, num_hidden_layers=2, num_attention_heads=4)

# (config_cls, model_attr, config_kwargs, expected_arch_kind)
CASES = [
    (
        "OPTConfig",
        "OPTForCausalLM",
        dict(
            vocab_size=128,
            hidden_size=64,
            ffn_dim=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=128,
            word_embed_proj_dim=64,
            do_layer_norm_before=True,
        ),
        "opt",
    ),
    (
        "GPTJConfig",
        "GPTJForCausalLM",
        dict(
            vocab_size=128,
            n_embd=64,
            n_layer=2,
            n_head=4,
            rotary_dim=8,
            n_positions=128,
        ),
        "gptj",
    ),
    (
        "GPTNeoXConfig",
        "GPTNeoXForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=128,
            rotary_pct=0.25,
            use_parallel_residual=True,
            max_position_embeddings=128,
        ),
        "gpt_neox",
    ),
    (
        "GPTNeoXConfig",
        "GPTNeoXForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=128,
            rotary_pct=0.5,
            use_parallel_residual=False,
            max_position_embeddings=128,
        ),
        "gpt_neox",
    ),
    (
        "FalconConfig",
        "FalconForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            new_decoder_architecture=True,
            num_kv_heads=2,
            bias=False,
            alibi=False,
            max_position_embeddings=128,
        ),
        "falcon",
    ),
    (
        "FalconConfig",
        "FalconForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            new_decoder_architecture=False,
            multi_query=True,
            parallel_attn=True,
            bias=False,
            alibi=False,
            max_position_embeddings=128,
        ),
        "falcon",
    ),
    (
        "FalconConfig",
        "FalconForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            new_decoder_architecture=False,
            multi_query=False,
            parallel_attn=False,
            bias=True,
            alibi=True,
            max_position_embeddings=128,
        ),
        "falcon",
    ),
    (
        "BloomConfig",
        "BloomForCausalLM",
        dict(vocab_size=128, hidden_size=64, n_layer=2, n_head=4),
        "bloom",
    ),
    (
        "MptConfig",
        "MptForCausalLM",
        dict(
            vocab_size=128,
            d_model=64,
            n_heads=4,
            n_layers=2,
            expansion_ratio=4,
            max_seq_len=128,
        ),
        "mpt",
    ),
    (
        "Phi3Config",
        "Phi3ForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=128,
            num_key_value_heads=2,
            max_position_embeddings=128,
            pad_token_id=0,
        ),
        "phi3",
    ),
    (
        "GemmaConfig",
        "GemmaForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=128,
            num_key_value_heads=2,
            head_dim=16,
            max_position_embeddings=128,
        ),
        "gemma",
    ),
    (
        "GPT2Config",
        "GPT2LMHeadModel",
        dict(vocab_size=128, n_embd=64, n_layer=2, n_head=4, n_positions=128),
        "gpt2",
    ),
    (
        "GPTBigCodeConfig",
        "GPTBigCodeForCausalLM",
        dict(
            vocab_size=128,
            n_embd=64,
            n_layer=2,
            n_head=4,
            n_positions=128,
            multi_query=True,
        ),
        "gpt_bigcode",
    ),
    (
        "Starcoder2Config",
        "Starcoder2ForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=128,
            num_key_value_heads=2,
            use_bias=True,
            max_position_embeddings=128,
        ),
        "starcoder2",
    ),
    (
        "StableLmConfig",
        "StableLmForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=128,
            num_key_value_heads=2,
            partial_rotary_factor=0.25,
            max_position_embeddings=128,
        ),
        "stablelm",
    ),
    (
        "PhiConfig",
        "PhiForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=128,
            partial_rotary_factor=0.5,
            max_position_embeddings=128,
        ),
        "phi",
    ),
    (
        "CodeGenConfig",
        "CodeGenForCausalLM",
        dict(
            vocab_size=128,
            n_embd=64,
            n_layer=2,
            n_head=4,
            rotary_dim=8,
            n_ctx=128,
            n_positions=128,
        ),
        "codegen",
    ),
]


def _build_and_save(cfg_name, model_name, kwargs, path):
    cfg = getattr(transformers, cfg_name)(**kwargs)
    torch.manual_seed(0)
    model = getattr(transformers, model_name)(cfg)
    model = model.eval().to(torch.float32)
    model.save_pretrained(path, safe_serialization=True)
    return model


@pytest.mark.parametrize(
    "cfg_name,model_name,kwargs,kind",
    CASES,
    ids=[f"{c[3]}-{i}" for i, c in enumerate(CASES)],
)
def test_arch_logits_parity(tmp_path, cfg_name, model_name, kwargs, kind):
    path = str(tmp_path / kind)
    hf_model = _build_and_save(cfg_name, model_name, kwargs, path)

    params, mcfg = AutoQ.from_pretrained(path, dtype=jnp.float32)
    assert mcfg.arch == kind

    ids = np.array([[3, 17, 42, 99, 7, 64, 23]], np.int64)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.float().numpy()
    ours, _ = forward(params, mcfg, jnp.asarray(ids.astype(np.int32)))
    ours = np.asarray(ours)
    np.testing.assert_array_equal(ours.argmax(-1), ref.argmax(-1))
    np.testing.assert_allclose(ours, ref, atol=0.15, rtol=0.05)


@pytest.mark.parametrize(
    "case_idx",
    [7, 2, 11],  # bloom (headwise fused), neox (fused+parallel), gpt2 (conv1d)
    ids=["bloom", "gpt_neox", "gpt2"],
)
def test_arch_quantize_roundtrip(tmp_path, case_idx):
    """HQQ-quantize a fused-qkv arch, save (fused re-export), reload,
    and check argmax parity vs the float torch model."""
    cfg_name, model_name, kwargs, kind = CASES[case_idx]
    path = str(tmp_path / kind)
    hf_model = _build_and_save(cfg_name, model_name, kwargs, path)

    from qllm_tpu.args_config import FakeArgs
    from qllm_tpu.auto_quant import AutoModelQuantization

    amq = AutoModelQuantization()
    params, mcfg = AutoQ.from_pretrained(path, dtype=jnp.float32)
    qparams = amq.api_quantize(
        params,
        mcfg,
        args=FakeArgs(
            model=path,
            quant_method="hqq",
            wbits=8,
            groupsize=32,
            nsamples=2,
            seqlen=32,
            dataset="synthetic",
        ),
    )
    out = str(tmp_path / f"{kind}-q")
    amq.save_model(
        qparams,
        mcfg,
        FakeArgs(model=path, quant_method="hqq", pack_mode="HQQ"),
        out,
    )
    # fused archs must write the native fused tensor name
    from qllm_tpu.modeling.archs import spec_from_model_config

    spec = spec_from_model_config(mcfg)
    if spec.fused_qkv is not None:
        from safetensors import safe_open
        import os

        with safe_open(
            os.path.join(out, "model.safetensors"), framework="np"
        ) as f:
            keys = list(f.keys())
        base = f"{spec.layers_prefix}.0.{spec.fused_qkv}"
        assert f"{base}.qweight" in keys, keys

    p2, c2 = AutoQ.from_quantized(out, dtype=jnp.float32)
    ids = np.array([[5, 9, 33, 77]], np.int32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids.astype(np.int64))).logits
    ours, _ = forward(p2, c2, jnp.asarray(ids))
    np.testing.assert_array_equal(
        np.asarray(ours).argmax(-1), ref.float().numpy().argmax(-1)
    )


def test_gptq_plain_mlp_arch(tmp_path):
    """GPTQ (Hessian path) on a plain-MLP parallel-residual arch — the
    up_proj Hessian must exist without a gate_proj to alias from."""
    cfg_name, model_name, kwargs, kind = CASES[2]  # gpt_neox
    path = str(tmp_path / kind)
    hf_model = _build_and_save(cfg_name, model_name, kwargs, path)

    from qllm_tpu.args_config import FakeArgs
    from qllm_tpu.auto_quant import AutoModelQuantization

    amq = AutoModelQuantization()
    params, mcfg = AutoQ.from_pretrained(path, dtype=jnp.float32)
    qparams = amq.api_quantize(
        params,
        mcfg,
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
    ids = np.array([[5, 9, 33, 77]], np.int32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids.astype(np.int64))).logits
    ours, _ = forward(qparams, mcfg, jnp.asarray(ids))
    np.testing.assert_array_equal(
        np.asarray(ours).argmax(-1), ref.float().numpy().argmax(-1)
    )


def test_normalized_config_roundtrip(tmp_path):
    """Our save_pretrained config.json reloads to the identical
    ModelConfig for a non-llama arch."""
    cfg_name, model_name, kwargs, kind = CASES[4]  # falcon new arch
    path = str(tmp_path / "src")
    _build_and_save(cfg_name, model_name, kwargs, path)
    params, mcfg = AutoQ.from_pretrained(path, dtype=jnp.float32)
    out = str(tmp_path / "dst")
    AutoQ.save_pretrained(params, mcfg, out, pack_mode="GPTQ")
    p2, c2 = AutoQ.from_pretrained(out, dtype=jnp.float32)
    assert c2 == mcfg
    ids = jnp.asarray(np.array([[1, 2, 3]], np.int32))
    a, _ = forward(params, mcfg, ids)
    b, _ = forward(p2, c2, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)
