"""Full ONNX decoder export beyond the llama family: MoE (mixtral,
qwen2-moe), MLA + group-limited MoE (deepseek-v2), ALiBi (bloom) —
VERDICT r3 item 3. Each arch's merged decoder is executed by the
pure-numpy evaluator and checked against eval/numpy_ref.py (which is
itself pinned to HF torch in tests/test_numpy_ref_exotic.py), prefill
AND a with-past decode step. Reference contract: the torch-trace
exporter handles any supported model (exporter.py:11-65)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import transformers

from qllm_tpu.eval.numpy_ref import np_forward_logits
from qllm_tpu.export.onnx_decoder import export_onnx_decoder
from qllm_tpu.export.onnx_exec import run_model
from qllm_tpu.modeling.auto import AutoQuantizedModelForCausalLM as AutoQ
from qllm_tpu.quant.config import HQQConfig
from qllm_tpu.quant.hqq import HQQQuantizer

TINY = dict(
    vocab_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    hidden_size=64,
    intermediate_size=96,
    max_position_embeddings=128,
)

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
        dict(vocab_size=128, n_layer=2, n_head=4, hidden_size=64),
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
        dict(**TINY, rotary_pct=0.25, use_parallel_residual=True),
        "gpt_neox",
    ),
    (
        "Qwen3Config",
        "Qwen3ForCausalLM",
        dict(**TINY, num_key_value_heads=2, head_dim=16),
        "qwen3",
    ),
    (
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


def _params(tmp_path, cfg_name, model_name, kwargs, tag, quantize):
    cfg = getattr(transformers, cfg_name)(**kwargs)
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    m = getattr(transformers, model_name)(cfg).eval().to(torch.float32)
    path = str(tmp_path / tag)
    m.save_pretrained(path, safe_serialization=True)
    params, mcfg = AutoQ.from_pretrained(path, dtype=jnp.float32)
    if quantize:
        q = HQQQuantizer(HQQConfig(wbits=4, groupsize=16))
        params = q.quantize(params, mcfg, None, progress=False)
    return params, mcfg


@pytest.mark.parametrize("quantize", [False, True], ids=["float", "w4"])
@pytest.mark.parametrize(
    "cfg_name,model_name,kwargs,tag", CASES, ids=[c[3] for c in CASES]
)
def test_exotic_export_prefill_and_decode(
    tmp_path, cfg_name, model_name, kwargs, tag, quantize
):
    params, cfg = _params(
        tmp_path, cfg_name, model_name, kwargs, tag, quantize
    )
    paths = export_onnx_decoder(params, cfg, str(tmp_path / "onnx"))
    data = open(paths["decoder_model_merged.onnx"], "rb").read()

    rng = np.random.default_rng(11)
    T = 6
    ids = rng.integers(1, 120, (1, T)).astype(np.int64)
    feeds = {
        "input_ids": ids,
        "attention_mask": np.ones((1, T), np.int64),
        "position_ids": np.arange(T, dtype=np.int64)[None],
        "use_cache_branch": np.asarray([False]),
    }
    out = run_model(data, feeds)
    ref = np_forward_logits(params, cfg, ids)
    scale = max(float(np.abs(ref).max()), 1e-6)
    err = float(np.abs(out["logits"] - ref).max()) / scale
    assert err < 1e-2, f"{tag} prefill rel err {err}"

    # with-past decode step vs the full-context numpy forward
    nxt = np.argmax(out["logits"][:, -1], -1).astype(np.int64)
    feeds2 = {
        "input_ids": nxt[:, None],
        "attention_mask": np.ones((1, T + 1), np.int64),
        "position_ids": np.full((1, 1), T, np.int64),
        "use_cache_branch": np.asarray([True]),
    }
    for i in range(cfg.num_hidden_layers):
        feeds2[f"past_key_values.{i}.key"] = out[f"present.{i}.key"]
        feeds2[f"past_key_values.{i}.value"] = out[f"present.{i}.value"]
    out2 = run_model(data, feeds2)
    full = np.concatenate([ids, nxt[:, None]], 1)
    ref2 = np_forward_logits(params, cfg, full)[:, -1:]
    err2 = float(np.abs(out2["logits"] - ref2).max()) / max(
        float(np.abs(ref2).max()), 1e-6
    )
    assert err2 < 1e-2, f"{tag} decode rel err {err2}"


def test_registry_moe_archs_not_downgraded(tmp_path):
    """The CLI export path must produce the FULL decoder for MoE/MLA/
    ALiBi archs — no silent per-block-subgraph downgrade."""
    params, cfg = _params(tmp_path, *CASES[0][:3], "mixtral-cli", True)
    paths = export_onnx_decoder(params, cfg, str(tmp_path / "cli"))
    assert "decoder_model_merged.onnx" in paths
