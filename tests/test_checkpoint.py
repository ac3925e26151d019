"""Checkpoint save/load: round trips in every pack mode + dialect
detection + logits equality after reload."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qllm_tpu.modeling import AutoQuantizedModelForCausalLM as AutoQ
from qllm_tpu.modeling.qconfig_io import BaseQuantizeConfig
from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, forward, init_params
from qllm_tpu.quant.config import HQQConfig, GPTQConfig
from qllm_tpu.quant.hqq import HQQQuantizer
from qllm_tpu.quant.qtensor import QuantizedTensor, quantize_tensor

CFG = TINY_LLAMA_TEST_CONFIG


def _rtn_params():
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


@pytest.mark.parametrize("pack_mode", ["GPTQ", "GEMM", "ORT"])
def test_save_load_roundtrip(tmp_path, pack_mode):
    qparams = _rtn_params()
    path = str(tmp_path / pack_mode)
    AutoQ.save_pretrained(qparams, CFG, path, pack_mode=pack_mode)
    assert os.path.exists(os.path.join(path, "model.safetensors"))
    assert os.path.exists(os.path.join(path, "quant_config.json"))

    params2, cfg2 = AutoQ.from_quantized(path)
    assert cfg2.num_hidden_layers == CFG.num_hidden_layers
    assert isinstance(params2["layers"][0]["q_proj"], QuantizedTensor)

    tok = jnp.asarray([[1, 5, 9, 13]], jnp.int32)
    l1, _ = forward(qparams, CFG, tok)
    l2, _ = forward(params2, cfg2, tok)
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l2), atol=5e-2, rtol=5e-2
    )


def test_from_pretrained_autodetects_quantized(tmp_path):
    qparams = _rtn_params()
    path = str(tmp_path / "auto")
    AutoQ.save_pretrained(qparams, CFG, path, pack_mode="GPTQ")
    params2, _ = AutoQ.from_pretrained(path)
    assert isinstance(params2["layers"][0]["q_proj"], QuantizedTensor)


def test_float_save_load(tmp_path):
    params = init_params(CFG, jax.random.key(1))
    path = str(tmp_path / "float")
    # save float params (no QuantizedTensor leaves)
    AutoQ.save_pretrained(params, CFG, path, pack_mode="GPTQ")
    # remove quant configs => float checkpoint
    os.remove(os.path.join(path, "quant_config.json"))
    os.remove(os.path.join(path, "quantize_config.json"))
    params2, cfg2 = AutoQ.from_pretrained(path)
    tok = jnp.asarray([[3, 1, 4]], jnp.int32)
    l1, _ = forward(params, CFG, tok)
    l2, _ = forward(params2, cfg2, tok)
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l2), atol=5e-2, rtol=5e-2
    )


def test_autogptq_dialect(tmp_path):
    """A version-less quantize_config.json is AutoGPTQ: zeros stored -1."""
    qparams = _rtn_params()
    path = str(tmp_path / "agq")
    AutoQ.save_pretrained(
        qparams, CFG, path, pack_mode="GPTQ", compatible_with_autogptq=True
    )
    # rewrite configs to look like a pure AutoGPTQ export
    os.remove(os.path.join(path, "quant_config.json"))
    with open(os.path.join(path, "quantize_config.json"), "w") as f:
        json.dump({"bits": 4, "group_size": 32, "desc_act": False}, f)
    conf = BaseQuantizeConfig.from_pretrained(path)
    assert conf.compatible_with_autogptq
    params2, cfg2 = AutoQ.from_quantized(path)
    tok = jnp.asarray([[2, 7, 11]], jnp.int32)
    l1, _ = forward(qparams, CFG, tok)
    l2, _ = forward(params2, cfg2, tok)
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l2), atol=5e-2, rtol=5e-2
    )


def test_mixed_bits_checkpoint(tmp_path):
    params = init_params(CFG, jax.random.key(2))
    layers = []
    for i, lp in enumerate(params["layers"]):
        nlp = dict(lp)
        for n in ("q_proj", "k_proj", "v_proj", "o_proj",
                  "gate_proj", "up_proj", "down_proj"):
            bits = 8 if i == 0 else 4
            nlp[n] = quantize_tensor(lp[n], bits, 32)
        layers.append(nlp)
    qparams = {**params, "layers": layers}
    path = str(tmp_path / "mixed")
    AutoQ.save_pretrained(qparams, CFG, path, pack_mode="GPTQ")
    with open(os.path.join(path, "quant_config_by_layer.json")) as f:
        by_layer = json.load(f)
    assert by_layer["model.layers.0.q_proj"]["wbits"] == 8
    assert by_layer["model.layers.1.q_proj"]["wbits"] == 4
    params2, _ = AutoQ.from_quantized(path)
    assert params2["layers"][0]["q_proj"].bits == 8
    assert params2["layers"][1]["q_proj"].bits == 4


def test_hqq_checkpoint_fractional_zeros(tmp_path):
    params = init_params(CFG, jax.random.key(3))
    qparams = HQQQuantizer(HQQConfig(wbits=4, groupsize=32)).quantize(
        params, CFG, progress=False
    )
    path = str(tmp_path / "hqq")
    AutoQ.save_pretrained(
        qparams, CFG, path, pack_mode="HQQ", quant_method="hqq"
    )
    params2, cfg2 = AutoQ.from_quantized(path)
    tok = jnp.asarray([[1, 2, 3]], jnp.int32)
    l1, _ = forward(qparams, CFG, tok)
    l2, _ = forward(params2, cfg2, tok)
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l2), atol=5e-2, rtol=5e-2
    )
