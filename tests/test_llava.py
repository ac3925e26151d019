"""LLaVA (multimodal passthrough) load → quantize → save → reload.

The reference quantizes only the language tower of llava/llava-next
(sequential_layes_awq_config.py llava entries) but saves the WHOLE HF
module, so its quantized checkpoints keep the vision tower, projector,
image_newline and the nested multimodal config. Our save_pretrained
must round-trip params['extra_tensors'] and params['hf_config'] the
same way (ADVICE r2: these were silently dropped)."""

import json
import os

import jax
import numpy as np
import pytest

from qllm_tpu.modeling.auto import AutoQuantizedModelForCausalLM as AutoQ
from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, init_params

CFG = TINY_LLAMA_TEST_CONFIG


def _llava_text_config():
    return {
        "model_type": "llama",
        "vocab_size": CFG.vocab_size,
        "hidden_size": CFG.hidden_size,
        "intermediate_size": CFG.intermediate_size,
        "num_hidden_layers": CFG.num_hidden_layers,
        "num_attention_heads": CFG.num_attention_heads,
        "num_key_value_heads": CFG.num_key_value_heads,
        "rms_norm_eps": CFG.rms_norm_eps,
        "rope_theta": CFG.rope_theta,
        "max_position_embeddings": CFG.max_position_embeddings,
        "tie_word_embeddings": False,
    }


@pytest.fixture()
def llava_ckpt(tmp_path):
    """Synthetic llava checkpoint: tiny-llama language tower under
    model.language_model.* plus vision/projector passthrough tensors."""
    from qllm_tpu.modeling.auto import _st_save

    rng = np.random.default_rng(0)
    params = init_params(CFG, jax.random.key(0))
    tensors = {}
    tensors["model.language_model.embed_tokens.weight"] = np.asarray(
        params["embed_tokens"], np.float16
    )
    tensors["model.language_model.norm.weight"] = np.asarray(
        params["norm"], np.float16
    )
    tensors["lm_head.weight"] = np.asarray(params["lm_head"], np.float16).T
    lin = {
        "q_proj": "self_attn.q_proj",
        "k_proj": "self_attn.k_proj",
        "v_proj": "self_attn.v_proj",
        "o_proj": "self_attn.o_proj",
        "gate_proj": "mlp.gate_proj",
        "up_proj": "mlp.up_proj",
        "down_proj": "mlp.down_proj",
    }
    for i, lp in enumerate(params["layers"]):
        base = f"model.language_model.layers.{i}"
        for ours, hf in lin.items():
            tensors[f"{base}.{hf}.weight"] = np.asarray(
                lp[ours], np.float16
            ).T  # torch [out, in]
        tensors[f"{base}.input_layernorm.weight"] = np.asarray(
            lp["input_layernorm"], np.float16
        )
        tensors[f"{base}.post_attention_layernorm.weight"] = np.asarray(
            lp["post_attention_layernorm"], np.float16
        )
    # the multimodal extras that must survive quantization
    extras = {
        "model.vision_tower.encoder.layers.0.mlp.fc1.weight": rng.normal(
            size=(16, 8)
        ).astype(np.float16),
        "model.vision_tower.embeddings.patch_embedding.weight": rng.normal(
            size=(8, 3, 2, 2)
        ).astype(np.float16),
        "model.multi_modal_projector.linear_1.weight": rng.normal(
            size=(CFG.hidden_size, 8)
        ).astype(np.float16),
        "model.image_newline": rng.normal(size=(CFG.hidden_size,)).astype(
            np.float16
        ),
    }
    tensors.update(extras)
    path = str(tmp_path / "llava_ckpt")
    os.makedirs(path)
    _st_save(tensors, path)
    hf_cfg = {
        "architectures": ["LlavaForConditionalGeneration"],
        "model_type": "llava",
        "text_config": _llava_text_config(),
        "vision_config": {"model_type": "clip_vision_model", "hidden_size": 8},
        "image_token_index": 32,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f)
    return path, extras, hf_cfg


def test_llava_quantize_save_reload_keeps_vision(llava_ckpt, tmp_path):
    path, extras, hf_cfg = llava_ckpt
    params, cfg = AutoQ.from_pretrained(path)
    assert cfg.arch == "llava"
    assert "extra_tensors" in params and "hf_config" in params
    assert set(params["extra_tensors"]) == set(extras)

    from qllm_tpu.quant.config import HQQConfig
    from qllm_tpu.quant.hqq import HQQQuantizer

    q = HQQQuantizer(HQQConfig(wbits=4, groupsize=32))
    qparams = q.quantize(params, cfg, None, progress=False)
    # quantizers must not drop the passthrough leaves
    qparams.setdefault("extra_tensors", params["extra_tensors"])
    qparams.setdefault("hf_config", params["hf_config"])

    out = str(tmp_path / "llava_q")
    AutoQ.save_pretrained(qparams, cfg, out, pack_mode="HQQ", quant_method="hqq")

    # nested multimodal config survives
    saved_cfg = json.load(open(os.path.join(out, "config.json")))
    assert saved_cfg["architectures"] == ["LlavaForConditionalGeneration"]
    assert "vision_config" in saved_cfg and "text_config" in saved_cfg

    params2, cfg2 = AutoQ.from_quantized(out)
    assert cfg2.arch == "llava"
    assert set(params2.get("extra_tensors", {})) == set(extras)
    for k, v in extras.items():
        np.testing.assert_array_equal(
            np.asarray(params2["extra_tensors"][k], np.float16), v
        )

    # the quantized language tower still runs
    import jax.numpy as jnp

    from qllm_tpu.models import forward
    from qllm_tpu.models.generate import make_cache

    tok = jnp.asarray(np.arange(6)[None], jnp.int32)
    cache = make_cache(cfg2, 1, 32, False)
    logits, _ = forward(params2, cfg2, tok, cache, pos=jnp.int32(0))
    assert np.isfinite(np.asarray(logits)).all()
