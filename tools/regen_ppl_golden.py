"""Regenerate the committed PPL golden fixture + values (CPU, f32).

The fixture is a deterministic 'structured' token stream — a seeded
order-2 Markov chain over the tiny test vocab, so the model's
(random-init) logits see non-uniform transition statistics and the PPL
number is sensitive to real numeric changes in the forward/quantizer
path (pure-uniform random ids would wash quantization effects out).
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from qllm_tpu.eval.perplexity import perplexity_from_ids
from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, init_params
from qllm_tpu.quant.config import HQQConfig
from qllm_tpu.quant.hqq import HQQQuantizer

cfg = TINY_LLAMA_TEST_CONFIG
V = cfg.vocab_size
rng = np.random.default_rng(7)
# sparse order-2 transition table: each (a, b) context allows 8 successors
succ = rng.integers(0, V, size=(V, V, 8))
n_tokens = 128 * 24
toks = np.empty((n_tokens,), np.int32)
toks[0], toks[1] = 1, 2
for i in range(2, n_tokens):
    toks[i] = succ[toks[i - 2], toks[i - 1], rng.integers(0, 8)]

out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "data")
os.makedirs(out_dir, exist_ok=True)
np.save(os.path.join(out_dir, "ppl_tokens.npy"), toks)

params = init_params(cfg, jax.random.key(1234))
ppl_fp = perplexity_from_ids(params, cfg, toks, n_ctx=128)
q = HQQQuantizer(HQQConfig(wbits=4, groupsize=32))
qparams = q.quantize(params, cfg, None, progress=False)
ppl_q = perplexity_from_ids(qparams, cfg, toks, n_ctx=128)
golden = {"fp32": ppl_fp, "hqq_w4_g32": ppl_q, "max_ratio": 1.25}
with open(os.path.join(out_dir, "ppl_golden.json"), "w") as f:
    json.dump(golden, f, indent=1)
print(golden)
