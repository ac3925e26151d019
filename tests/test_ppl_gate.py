"""Perplexity accuracy gates (BASELINE.md: PPL within 0.05 of the
reference at equal bits/groupsize).

Two layers of defense:

1. ``test_ppl_golden_regression`` — fully offline: a committed token
   fixture + a seeded tiny model, HQQ W4 g128 (BASELINE config 1
   semantics). Asserts the absolute PPL against a golden number — ANY
   numeric drift in quantizer / model / harness trips it.
2. ``test_real_wikitext2_ppl`` — the real-data gate. Runs only when the
   driver provides real assets (zero-egress env):
     * ``$QLLM_TPU_DATA_DIR/wikitext2.txt`` (raw test split) AND a
       tokenizer+model via ``$QLLM_TPU_PPL_MODEL`` (HF checkpoint dir),
       OR pre-tokenized ``$QLLM_TPU_DATA_DIR/wikitext2_test_tokens.npy``
       with ``$QLLM_TPU_PPL_MODEL``.
   Quantizes the model HQQ W4 g128 and asserts ΔPPL <= 0.05 vs the
   float model. Skipped (loudly) when assets are absent.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qllm_tpu.eval.perplexity import perplexity_from_ids
from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, init_params
from qllm_tpu.quant.config import HQQConfig
from qllm_tpu.quant.hqq import HQQQuantizer

_FIXTURE = os.path.join(os.path.dirname(__file__), "data", "ppl_tokens.npy")

# Golden values for the committed fixture (recorded on CPU f32;
# regenerate ONLY with tools/regen_ppl_golden.py and justify the change)
_GOLDEN = os.path.join(os.path.dirname(__file__), "data", "ppl_golden.json")


def _tiny_params():
    return init_params(TINY_LLAMA_TEST_CONFIG, jax.random.key(1234))


def test_ppl_golden_regression():
    import json

    tokens = np.load(_FIXTURE)
    with open(_GOLDEN) as f:
        golden = json.load(f)
    params = _tiny_params()
    cfg = TINY_LLAMA_TEST_CONFIG
    ppl_fp = perplexity_from_ids(params, cfg, tokens, n_ctx=128)
    q = HQQQuantizer(HQQConfig(wbits=4, groupsize=32))
    qparams = q.quantize(params, cfg, None, progress=False)
    ppl_q = perplexity_from_ids(qparams, cfg, tokens, n_ctx=128)
    assert np.isfinite(ppl_q)
    # absolute regression pins (rel 5e-3: CPU XLA numeric wiggle room)
    np.testing.assert_allclose(ppl_fp, golden["fp32"], rtol=5e-3)
    np.testing.assert_allclose(ppl_q, golden["hqq_w4_g32"], rtol=5e-3)
    # quantization must not blow up PPL on the fixture
    assert ppl_q / ppl_fp < golden["max_ratio"]


def test_real_wikitext2_ppl():
    data_dir = os.environ.get("QLLM_TPU_DATA_DIR", "")
    model_dir = os.environ.get("QLLM_TPU_PPL_MODEL", "")
    tok_file = os.path.join(data_dir, "wikitext2_test_tokens.npy")
    txt_file = os.path.join(data_dir, "wikitext2.txt")
    if not model_dir or not os.path.isdir(model_dir):
        pytest.skip(
            "real-data PPL gate: set QLLM_TPU_PPL_MODEL to an HF "
            "checkpoint dir and QLLM_TPU_DATA_DIR to a dir holding "
            "wikitext2.txt or wikitext2_test_tokens.npy"
        )
    if os.path.exists(tok_file):
        tokens = np.load(tok_file)
    elif os.path.exists(txt_file):
        transformers = pytest.importorskip("transformers")
        tok = transformers.AutoTokenizer.from_pretrained(model_dir)
        tokens = tok(
            open(txt_file, encoding="utf-8").read(), return_tensors="np"
        ).input_ids[0]
    else:
        pytest.skip("real-data PPL gate: no wikitext2 tokens/text found")
    from qllm_tpu.modeling.auto import AutoQuantizedModelForCausalLM as AutoQ

    params, cfg = AutoQ.from_pretrained(model_dir, dtype=jnp.float32)
    max_chunks = int(os.environ.get("QLLM_TPU_PPL_CHUNKS", "40"))
    ppl_fp = perplexity_from_ids(
        params, cfg, tokens, n_ctx=512, max_chunks=max_chunks
    )

    # the BASELINE.md contract as written: OUR GPTQ within a flat 0.05
    # of the REFERENCE GPTQ at equal bits/groupsize, same calibration
    from qllm_tpu.quant.config import GPTQConfig
    from qllm_tpu.quant.gptq import GPTQQuantizer

    flat = tokens.reshape(-1)
    n_calib = min(16, len(flat) // 512)
    calib = flat[: n_calib * 512].reshape(n_calib, 512).astype(np.int32)
    q = GPTQQuantizer(GPTQConfig(wbits=4, groupsize=128))
    qparams = q.quantize(params, cfg, jnp.asarray(calib), progress=False)
    ppl_q = perplexity_from_ids(
        qparams, cfg, tokens, n_ctx=512, max_chunks=max_chunks
    )

    from ref_gptq_loader import reference_available, reference_quantize_params

    if reference_available():
        refparams = reference_quantize_params(
            params, cfg, calib, bits=4, groupsize=128
        )
        ppl_ref = perplexity_from_ids(
            refparams, cfg, tokens, n_ctx=512, max_chunks=max_chunks
        )
        print(
            f"wikitext2 ppl: fp={ppl_fp:.4f} ours_gptq_w4g128={ppl_q:.4f} "
            f"reference_gptq_w4g128={ppl_ref:.4f}"
        )
        assert ppl_q - ppl_ref <= 0.05  # flat BASELINE contract
    else:
        print(f"wikitext2 ppl: fp={ppl_fp:.4f} ours_gptq_w4g128={ppl_q:.4f}")
    # BASELINE.md as written: wikitext-2 PPL delta <= 0.05 flat in the
    # real-checkpoint regime (ppl_fp < 20). The relative slack survives
    # ONLY for the synthetic-scale regime (random tiny models, ppl in
    # the thousands) where a flat 0.05 is meaningless.
    if ppl_fp < 20.0:
        assert ppl_q - ppl_fp <= 0.05
    else:
        assert ppl_q - ppl_fp <= 0.05 + 0.0051 * ppl_fp
