"""GPTQ numerics parity against the reference's OWN torch quantizer.

The accuracy contract (BASELINE.md: PPL within 0.05 of reference GPTQ
at equal bits/groupsize) is made measurable offline by importing the
reference's pure-torch GPTQ core
(/root/reference/qllm/quantization/gptq/gptq.py:129-258 fasterquant +
_gptq_quantizer.py find_params) and running it on the SAME weight and
SAME Hessian as our jax _gptq_core, across the option matrix
(act_order, static_groups, MSE grid). Both produce a dequantized
weight; they must agree to quantization-grid resolution. A final
end-to-end check swaps reference-quantized weights into OUR forward
and asserts the PPL delta vs our-GPTQ weights is within the contract.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_GPTQ = "/root/reference/qllm/quantization/gptq/gptq.py"
REF_QUANTIZER = "/root/reference/qllm/quantization/gptq/_gptq_quantizer.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_GPTQ), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_gptq():
    pytest.importorskip("torch")
    from ref_gptq_loader import load_reference_gptq

    return load_reference_gptq()


def _make_problem(seed, K=128, N=64, tokens=256):
    rng = np.random.default_rng(seed)
    w = (rng.normal(size=(K, N)) * 0.08).astype(np.float32)  # [in, out]
    x = rng.normal(size=(tokens, K)).astype(np.float32)
    # reference add_batch semantics: H = 2/n Σ xxT
    H = (2.0 / tokens) * (x.T @ x).astype(np.float32)
    return w, H


def _run_reference(mod, torch, w, H, bits, groupsize, actorder, static_groups, mse):
    K, N = w.shape
    layer = torch.nn.Linear(K, N, bias=False)
    layer.weight.data = torch.from_numpy(w.T.copy())  # [out, in]
    g = mod.GPTQ(layer)
    g.inp1 = None  # print_loss expects add_batch to have set these
    g.out1 = None
    g.H = torch.from_numpy(H.copy())
    g.quantizer.configure(bits, perchannel=True, sym=False, mse=mse)
    scale, zero, g_idx, error = g.fasterquant(
        blocksize=32,
        percdamp=0.01,
        groupsize=groupsize,
        actorder=actorder,
        static_groups=static_groups,
    )
    dq = layer.weight.data.numpy().T  # [K, N] dequantized
    return dq, scale.numpy(), zero.numpy(), g_idx.numpy(), error


def _run_ours(w, H, bits, groupsize, actorder, static_groups, mse):
    from qllm_tpu.quant.config import GPTQConfig
    from qllm_tpu.quant.gptq import gptq_quantize_weight
    from qllm_tpu.quant.qtensor import dequantize_tensor

    from qllm_tpu.quant.qtensor import unpermute_dense

    cfg = GPTQConfig(
        wbits=bits,
        groupsize=groupsize,
        act_order=actorder,
        static_groups=static_groups,
        percdamp=0.01,
        mse=mse,
    )
    qt, err = gptq_quantize_weight(
        jnp.asarray(w), jnp.asarray(H), bits, groupsize, config=cfg
    )
    # our QuantizedTensor keeps rows in permuted order (the kernel
    # gathers activations by qt.perm); the reference returns original
    # feature order — unpermute for the comparison
    dq = unpermute_dense(qt, dequantize_tensor(qt))
    return np.asarray(dq, np.float32), qt


@pytest.mark.parametrize(
    "actorder,static_groups,mse",
    [
        (False, False, False),
        (True, False, False),
        (True, True, False),
        (False, False, True),
    ],
    ids=["plain", "act_order", "act_order+static", "mse"],
)
def test_gptq_core_matches_reference(ref_gptq, actorder, static_groups, mse):
    mod, torch = ref_gptq
    bits, groupsize = 4, 32
    w, H = _make_problem(0)
    ref_dq, ref_scale, _, ref_gidx, _ = _run_reference(
        mod, torch, w, H, bits, groupsize, actorder, static_groups, mse
    )
    our_dq, qt = _run_ours(w, H, bits, groupsize, actorder, static_groups, mse)

    # quantization-grid resolution: the fp32 Cholesky chains differ at
    # ~1e-7, which can flip a round() on a razor's-edge column; require
    # near-total exact agreement and never more than one quantum apart
    scale_mag = float(np.abs(ref_scale).mean())
    mismatch = np.abs(our_dq - ref_dq) > 1e-4
    frac = mismatch.mean()
    assert frac < 0.01, f"{frac:.2%} of entries differ from reference GPTQ"
    assert float(np.abs(our_dq - ref_dq).max()) <= scale_mag * 1.5 + 1e-6

    if actorder:
        perm = np.asarray(qt.perm)
        gidx_ours = perm // groupsize if static_groups else None
        # reference g_idx is in original feature order
        if static_groups:
            ours_orig = np.empty(len(perm), np.int64)
            ours_orig[perm] = np.arange(len(perm)) // groupsize
            # static+act_order: reference keeps original grouping
            np.testing.assert_array_equal(
                ref_gidx, np.arange(len(perm)) // groupsize
            )


def test_gptq_same_hessian_ppl_delta_within_contract(ref_gptq):
    """End-to-end: quantize every linear of a tiny model with OUR GPTQ
    and with the REFERENCE GPTQ (same Hessians, same calibration), run
    both through OUR forward, and check |ΔPPL| <= 0.05 (BASELINE.md
    accuracy contract at equal bits/groupsize)."""
    mod, torch = ref_gptq
    from qllm_tpu.eval.perplexity import perplexity_from_ids
    from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, init_params
    from qllm_tpu.quant.config import GPTQConfig
    from qllm_tpu.quant.gptq import GPTQQuantizer
    from qllm_tpu.quant.qtensor import QuantizedTensor, quantize_tensor

    cfg = TINY_LLAMA_TEST_CONFIG
    params = init_params(cfg, jax.random.key(7))
    rng = np.random.default_rng(7)
    calib = rng.integers(0, cfg.vocab_size, (4, 64)).astype(np.int32)
    qcfg = GPTQConfig(wbits=4, groupsize=32)

    quantizer = GPTQQuantizer(qcfg)
    qparams = quantizer.quantize(
        params, cfg, jnp.asarray(calib), progress=False
    )

    # reference-quantized variant: the same sequential block pipeline
    # (Hessians from our collector, activations propagated through the
    # already-reference-quantized block), reference fasterquant per
    # linear, dequantized weights dropped into dense leaves
    from qllm_tpu.models.llama import ALL_LINEAR_NAMES
    from qllm_tpu.quant.frame import embed_inputs, run_block
    from qllm_tpu.quant.hessian import collect_block_hessians

    h, cos, sin, mask = embed_inputs(params, cfg, jnp.asarray(calib))
    ref_layers = []
    for lp in params["layers"]:
        nlp = dict(lp)
        Hs = collect_block_hessians(nlp, cfg, h, cos, sin, mask)
        for name in ALL_LINEAR_NAMES:
            if name not in lp or name not in Hs:
                continue
            w = np.asarray(lp[name], np.float32)
            K, N = w.shape
            layer = torch.nn.Linear(K, N, bias=False)
            layer.weight.data = torch.from_numpy(w.T.copy())
            g = mod.GPTQ(layer)
            g.inp1 = None
            g.out1 = None
            g.H = torch.from_numpy(np.asarray(Hs[name], np.float32).copy())
            g.quantizer.configure(4, perchannel=True, sym=False, mse=False)
            g.fasterquant(blocksize=32, percdamp=0.01, groupsize=32)
            nlp[name] = jnp.asarray(layer.weight.data.numpy().T)
        h = run_block(nlp, cfg, h, cos, sin, mask)
        ref_layers.append(nlp)
    refparams = {
        "embed_tokens": params["embed_tokens"],
        "norm": params["norm"],
        "lm_head": params["lm_head"],
        "layers": ref_layers,
    }

    eval_ids = rng.integers(0, cfg.vocab_size, (2, 128)).astype(np.int32)
    ppl_ours = perplexity_from_ids(qparams, cfg, eval_ids, n_ctx=64)
    ppl_ref = perplexity_from_ids(refparams, cfg, eval_ids, n_ctx=64)
    # BASELINE.md's contract is a flat 0.05 at real-checkpoint PPL scale
    # (llama2-7b wikitext ≈ 5.5, i.e. ≈0.9% relative). A random-init
    # model on random tokens sits at PPL ≈ vocab/e ≈ 10²-10³ where a
    # flat 0.05 is noise-level; apply the equivalent relative bound.
    rel = abs(ppl_ours - ppl_ref) / ppl_ref
    assert rel <= 0.009, (
        f"our GPTQ ppl {ppl_ours:.4f} vs reference GPTQ ppl "
        f"{ppl_ref:.4f} (rel delta {rel:.4%} > 0.9%)"
    )
