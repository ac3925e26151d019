"""numpy_ref coverage beyond the llama family: MoE (mixtral +
deepseek routing), MLA, ALiBi (+embed layernorm) — verified against the
HF torch models directly (the strongest oracle: no JAX in either side).
These paths back the ONNX export verification for the same archs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import transformers

from qllm_tpu.eval.numpy_ref import np_forward_logits
from qllm_tpu.modeling.auto import AutoQuantizedModelForCausalLM as AutoQ

TINY = dict(
    vocab_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    hidden_size=64,
    intermediate_size=96,
    max_position_embeddings=128,
)


def _build(tmp_path, cfg_name, model_name, kwargs, tag):
    cfg = getattr(transformers, cfg_name)(**kwargs)
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    m = getattr(transformers, model_name)(cfg).eval().to(torch.float32)
    path = str(tmp_path / tag)
    m.save_pretrained(path, safe_serialization=True)
    return m, path


CASES = [
    (
        "MixtralConfig",
        "MixtralForCausalLM",
        dict(
            **TINY,
            num_key_value_heads=2,
            num_local_experts=4,
            num_experts_per_tok=2,
        ),
        "mixtral",
    ),
    (
        "DeepseekV2Config",
        "DeepseekV2ForCausalLM",
        dict(
            **TINY,
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
            topk_method="group_limited_greedy",
            n_group=2,
            topk_group=1,
            routed_scaling_factor=2.0,
            num_key_value_heads=4,
        ),
        "deepseek_v2",
    ),
    (
        "BloomConfig",
        "BloomForCausalLM",
        dict(
            vocab_size=128,
            n_layer=2,
            n_head=4,
            hidden_size=64,
        ),
        "bloom",
    ),
    (
        "Qwen2MoeConfig",
        "Qwen2MoeForCausalLM",
        dict(
            **TINY,
            num_key_value_heads=2,
            num_experts=4,
            num_experts_per_tok=2,
            moe_intermediate_size=32,
            shared_expert_intermediate_size=64,
            norm_topk_prob=False,
            decoder_sparse_step=1,
            mlp_only_layers=[],
        ),
        "qwen2_moe",
    ),
    (
        # learned positions (offset 2) + pre-LN + plain relu MLP + biases
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
        # parallel residual, shared input norm, gptj interleaved rope
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
        # parallel residual with a SECOND input norm + partial rotary
        "GPTNeoXConfig",
        "GPTNeoXForCausalLM",
        dict(
            **TINY,
            rotary_pct=0.25,
            use_parallel_residual=True,
        ),
        "gpt_neox",
    ),
    (
        # rms qk-norm over head_dim (shared weight)
        "Qwen3Config",
        "Qwen3ForCausalLM",
        dict(
            **TINY,
            num_key_value_heads=2,
            head_dim=16,
        ),
        "qwen3",
    ),
    (
        # parallel residual (shared norm) + per-head cohere qk-norm +
        # logit scale + tied embeddings
        "CohereConfig",
        "CohereForCausalLM",
        dict(
            **TINY,
            num_key_value_heads=4,
            logit_scale=0.0625,
            use_qk_norm=True,
        ),
        "cohere",
    ),
]


@pytest.mark.parametrize(
    "cfg_name,model_name,kwargs,tag", CASES, ids=[c[3] for c in CASES]
)
def test_np_forward_matches_hf(tmp_path, cfg_name, model_name, kwargs, tag):
    hf, path = _build(tmp_path, cfg_name, model_name, kwargs, tag)
    params, cfg = AutoQ.from_pretrained(path, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    ids = rng.integers(1, 120, (1, 9))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    got = np_forward_logits(params, cfg, ids)
    scale = max(np.abs(ref).max(), 1e-6)
    err = np.abs(got - ref).max() / scale
    assert err < 2e-2, f"{tag}: rel err {err}"
