"""Top-k-only MoE decode over [E]-stacked experts (models.moe).

Contract: the sparse indexed-expert path must be numerically equivalent
to the dense all-experts path (which itself has HF parity via
tests/test_archs.py), while reading only the selected experts' weights.
Reference role: HF's MixtralSparseMoeBlock token-gather, the forward the
reference quantizes through (sequential_layes_gptq_config.py:70-101).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, forward, init_params
from qllm_tpu.models.moe import has_stackable_experts, stack_experts
from qllm_tpu.models.generate import make_cache
from qllm_tpu.quant.config import HQQConfig
from qllm_tpu.quant.hqq import HQQQuantizer

MOE_CFG = dataclasses.replace(
    TINY_LLAMA_TEST_CONFIG,
    arch="mixtral",
    num_local_experts=4,
    num_experts_per_tok=2,
)

DS_CFG = dataclasses.replace(
    TINY_LLAMA_TEST_CONFIG,
    arch="deepseek_v2",
    num_local_experts=8,
    num_experts_per_tok=2,
    moe_router="deepseek",
    norm_topk_prob=True,
    routed_scaling_factor=2.0,
)


def _quantized_moe_params(cfg, seed=0, bits=4, groupsize=16):
    params = init_params(cfg, jax.random.key(seed))
    q = HQQQuantizer(HQQConfig(wbits=bits, groupsize=groupsize))
    return q.quantize(params, cfg, None, progress=False)


@pytest.mark.parametrize("cfg", [MOE_CFG, DS_CFG], ids=["mixtral", "deepseek"])
def test_sparse_matches_dense_float(cfg):
    params = init_params(cfg, jax.random.key(0))
    assert has_stackable_experts(params)
    stacked = stack_experts(params)
    # stacking must not mutate the original
    assert "experts" in params["layers"][0]
    assert "experts_stacked" in stacked["layers"][0]

    ids = jnp.asarray([[5, 9, 2]], jnp.int32)
    dense_logits, _ = forward(params, cfg, ids)
    atol = 3e-3  # grouped-selection einsum reorders bf16 accumulation
    # T=3, k=2, E>=4: B*T*k >= E for mixtral -> dense; single token is
    # the sparse regime. Compare a full prefill (dense) + 1-token decode
    # (sparse) against the all-dense run.
    cache = make_cache(cfg, 1, 16, quantized_kv=False)
    _, cache = forward(stacked, cfg, ids[:, :2], cache, pos=jnp.int32(0))
    step_logits, _ = forward(
        stacked, cfg, ids[:, 2:3], cache, pos=jnp.int32(2)
    )
    cache2 = make_cache(cfg, 1, 16, quantized_kv=False)
    _, cache2 = forward(params, cfg, ids[:, :2], cache2, pos=jnp.int32(0))
    ref_step, _ = forward(params, cfg, ids[:, 2:3], cache2, pos=jnp.int32(2))
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(ref_step), atol=atol, rtol=2e-3
    )
    # and the stacked full-T (dense loop over stacked tensors) matches
    full_stacked, _ = forward(stacked, cfg, ids)
    np.testing.assert_allclose(
        np.asarray(full_stacked), np.asarray(dense_logits), atol=atol, rtol=2e-3
    )


@pytest.mark.parametrize("cfg", [MOE_CFG, DS_CFG], ids=["mixtral", "deepseek"])
def test_sparse_matches_dense_quantized(cfg):
    qparams = _quantized_moe_params(cfg)
    stacked = stack_experts(qparams)
    ids = jnp.asarray([[3, 1]], jnp.int32)
    cache_a = make_cache(cfg, 1, 16, quantized_kv=True)
    cache_b = make_cache(cfg, 1, 16, quantized_kv=True)
    _, cache_a = forward(qparams, cfg, ids, cache_a, pos=jnp.int32(0))
    _, cache_b = forward(stacked, cfg, ids, cache_b, pos=jnp.int32(0))
    tok = jnp.asarray([[7]], jnp.int32)
    a, _ = forward(qparams, cfg, tok, cache_a, pos=jnp.int32(2))
    b, _ = forward(stacked, cfg, tok, cache_b, pos=jnp.int32(2))
    # identical math up to the stacked serving prep (zero pre-fold,
    # f32 scale storage) — tolerances match the layer-stack parity tests
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3)


def test_sparse_decode_loop_matches_dense_generate():
    """Multi-step greedy decode through decode_loop: the sparse path
    must reproduce the dense path's token stream exactly."""
    from qllm_tpu.models import greedy_generate

    qparams = _quantized_moe_params(MOE_CFG, seed=3)
    stacked = stack_experts(qparams)
    prompt = jnp.asarray([[1, 4, 2, 8]], jnp.int32)
    a = greedy_generate(qparams, MOE_CFG, prompt, max_new_tokens=8)
    b = greedy_generate(stacked, MOE_CFG, prompt, max_new_tokens=8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_auto_stacks_moe():
    """Engine must transparently stack MoE experts and still serve."""
    from qllm_tpu.serve import ContinuousBatchingEngine, ServeConfig

    qparams = _quantized_moe_params(MOE_CFG, seed=5)
    eng = ContinuousBatchingEngine(
        qparams, MOE_CFG, ServeConfig(max_batch=2, max_seq=32)
    )
    # hybrid stacking: layers-dict; homogeneous models get the full
    # [L*E] expert stack (dict + _moe_stride — the lax.scan MoE path)
    assert isinstance(eng.params["layers"], dict)
    est = eng.params["layers"]["experts_stacked"]
    assert isinstance(est, dict)
    assert (
        eng.params["layers"]["_moe_stride"] == MOE_CFG.num_local_experts
    )
    E_total = next(iter(est.values())).qweight.shape[0]
    assert E_total == MOE_CFG.num_local_experts * MOE_CFG.num_hidden_layers
    assert "experts" not in eng.params["layers"]
    # original params untouched (save paths keep the per-expert list)
    assert "experts" in qparams["layers"][0]
    eng.submit([1, 5, 3], max_new_tokens=4)
    done = eng.run()
    assert len(done) == 1 and len(done[0].output) == 4


def test_grouped_kernel_matches_fallback(monkeypatch):
    """The grouped expert GEMV kernel (one launch for all (token,
    expert) selections, interpret mode on CPU) must match the exact
    per-selection fallback within bf16-activation rounding."""
    import qllm_tpu.ops.pallas_qmm as pq
    from qllm_tpu.models.moe import grouped_expert_linear

    # kernel geometry needs K % 256 == 0 (the tiny 128-hidden test cfg
    # stays on the fallback); use the 256-hidden shape
    big_cfg = dataclasses.replace(
        MOE_CFG,
        hidden_size=256,
        intermediate_size=512,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=64,
    )
    params = init_params(big_cfg, jax.random.key(11))
    q = HQQQuantizer(HQQConfig(wbits=4, groupsize=32))
    qparams = q.quantize(params, big_cfg, None, progress=False)
    stacked = stack_experts(
        qparams, scale_store_dtype=jnp.bfloat16
    )
    w = stacked["layers"][0]["experts_stacked"]["gateup_proj"]
    rng = np.random.default_rng(0)
    n, K = 4, w.in_features
    x_np = rng.normal(size=(n, K)).astype(np.float32)
    x_np[3] = x_np[0]  # same (row, id) pair twice -> must agree exactly
    x_rows = jnp.asarray(x_np)
    ids = jnp.asarray([2, 0, 3, 2], jnp.int32)

    monkeypatch.setenv("QLLM_TPU_FORCE_STACKED_KERNEL", "1")
    assert pq.grouped_experts_ok(w)
    y_kernel = np.asarray(pq.qmatmul_grouped_experts(x_rows, w, ids))
    monkeypatch.delenv("QLLM_TPU_FORCE_STACKED_KERNEL")
    assert not pq.grouped_experts_ok(w)  # default CPU path = fallback
    y_fb = np.asarray(grouped_expert_linear(w, ids, x_rows))
    scale = np.abs(y_fb).max()
    assert np.abs(y_kernel - y_fb).max() < 2e-2 * scale + 1e-3
    # selections with the same id must agree exactly (same weights read)
    np.testing.assert_allclose(y_kernel[0], y_kernel[3], rtol=1e-6)


def test_heterogeneous_experts_keep_dense_path():
    """Mixed-bit experts cannot stack; params must pass through and the
    dense path must still serve them."""
    qparams = _quantized_moe_params(MOE_CFG, seed=7)
    fp = init_params(MOE_CFG, jax.random.key(7))
    from qllm_tpu.quant.qtensor import quantize_tensor

    # re-quantize one expert PER LAYER at different bits -> heterogeneous
    for li, lp in enumerate(qparams["layers"]):
        src = fp["layers"][li]["experts"][0]
        lp["experts"][0] = {
            n: quantize_tensor(src[n], bits=8, group_size=16)
            for n in ("gate_proj", "up_proj", "down_proj")
        }
    assert not has_stackable_experts(qparams)
    out = stack_experts(qparams)
    assert all("experts" in lp for lp in out["layers"])
    logits, _ = forward(out, MOE_CFG, jnp.asarray([[1, 2]], jnp.int32))
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_hybrid_stacking_matches_dense():
    """Hybrid MoE stacking ([L]-stacked attention + full [L*E] expert
    stack, lax.scan forward) must reproduce the dense per-layer path's
    greedy tokens exactly."""
    from qllm_tpu.models import greedy_generate
    from qllm_tpu.models.stacked import stack_layer_params_hybrid

    qparams = _quantized_moe_params(MOE_CFG, seed=13)
    hp = stack_layer_params_hybrid(
        {**qparams, "layers": [dict(lp) for lp in qparams["layers"]]}
    )
    assert not isinstance(hp["layers"], list)
    # homogeneous layers: full [L*E] stack served by the scan body
    assert isinstance(hp["layers"]["experts_stacked"], dict)
    assert hp["layers"]["_moe_stride"] == MOE_CFG.num_local_experts
    prompt = jnp.asarray([[1, 4, 2, 8]], jnp.int32)
    a = greedy_generate(qparams, MOE_CFG, prompt, max_new_tokens=8)
    b = greedy_generate(hp, MOE_CFG, prompt, max_new_tokens=8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hybrid_stacking_deepseek_mla():
    """Hybrid path over MLA + mixed dense/sparse layers (deepseek-v2
    shape): heterogeneous entries stay per-layer, output matches."""
    import torch
    import transformers

    from qllm_tpu.models import greedy_generate
    from qllm_tpu.models.stacked import stack_layer_params_hybrid
    from qllm_tpu.modeling.auto import AutoQuantizedModelForCausalLM as AutoQ
    import tempfile

    cfg = transformers.DeepseekV2Config(
        vocab_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
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
        n_shared_experts=1,
        moe_intermediate_size=64,
        first_k_dense_replace=1,
        topk_method="greedy",
        routed_scaling_factor=1.0,
    )
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    hf = transformers.DeepseekV2ForCausalLM(cfg).eval().to(torch.float32)
    path = tempfile.mkdtemp()
    hf.save_pretrained(path, safe_serialization=True)
    params, mcfg = AutoQ.from_pretrained(path, dtype=jnp.float32)
    q = HQQQuantizer(HQQConfig(wbits=4, groupsize=16))
    qparams = q.quantize(params, mcfg, None, progress=False)
    hp = stack_layer_params_hybrid(
        {**qparams, "layers": [dict(lp) for lp in qparams["layers"]]}
    )
    prompt = jnp.asarray([[3, 9, 5]], jnp.int32)
    a = greedy_generate(qparams, mcfg, prompt, max_new_tokens=6)
    b = greedy_generate(hp, mcfg, prompt, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batched_sparse_dedup_matches_dense(monkeypatch):
    """Batched decode (B>1) drives the sorted-selection sparse path:
    selections are reordered by expert id before the grouped kernel
    (weight-stream dedup of repeated experts) and un-sorted after —
    logits must still match the dense all-experts path per row, with
    deliberately colliding expert selections in the batch."""
    import qllm_tpu.ops.pallas_qmm as pq
    from qllm_tpu.models.llama import _moe_sparse, _router_weights, LayerView

    big_cfg = dataclasses.replace(
        MOE_CFG,
        hidden_size=256,
        intermediate_size=512,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=64,
        num_local_experts=16,  # B*T*k=8 < E keeps the sparse regime
        num_experts_per_tok=2,
    )
    params = init_params(big_cfg, jax.random.key(21))
    q = HQQQuantizer(HQQConfig(wbits=4, groupsize=32))
    qparams = q.quantize(params, big_cfg, None, progress=False)
    stacked = stack_experts(qparams, scale_store_dtype=jnp.bfloat16)
    lp = stacked["layers"][0]
    pv = LayerView(lp)
    rng = np.random.default_rng(3)
    B = 4
    # identical rows -> identical top-k -> guaranteed duplicate expert
    # ids across the batch (the dedup case), plus distinct rows
    x_np = rng.normal(size=(B, 1, big_cfg.hidden_size)).astype(np.float32)
    x_np[2] = x_np[0]
    x = jnp.asarray(x_np)

    monkeypatch.setenv("QLLM_TPU_FORCE_STACKED_KERNEL", "1")
    assert pq.grouped_experts_ok(lp["experts_stacked"]["gateup_proj"])
    y_sparse = np.asarray(_moe_sparse(pv, big_cfg, x, 2))

    # dense oracle over the same stacked weights (per-expert indexed
    # reads, no grouped kernel, no sorting)
    monkeypatch.delenv("QLLM_TPU_FORCE_STACKED_KERNEL")
    from qllm_tpu.models.llama import _moe_forward

    y_dense = np.asarray(_moe_forward(pv, big_cfg, jnp.asarray(
        np.concatenate([x_np, x_np], axis=1)  # B*T*k >= E -> dense path
    ))[:, :1])
    scale = np.abs(y_dense).max()
    assert np.abs(y_sparse - y_dense).max() < 2e-2 * scale + 1e-3
    # identical input rows must produce identical outputs (the sort is
    # a pure permutation; dedup must not mix rows)
    np.testing.assert_allclose(y_sparse[0], y_sparse[2], rtol=1e-6)


def test_hybrid_stacking_shared_experts():
    """qwen2-moe-style always-on shared experts ([L]-homogeneous across
    layers) must [L]-stack in hybrid prep and serve via apply_shared
    (tuned stacked kernel) with greedy tokens identical to the
    per-layer path. Also covers the sigmoid shared_expert_gate."""
    from qllm_tpu.models import greedy_generate
    from qllm_tpu.models.stacked import stack_layer_params_hybrid
    from qllm_tpu.quant.qtensor import QuantizedTensor, quantize_tensor

    cfg = dataclasses.replace(MOE_CFG, arch="qwen2_moe", n_shared_experts=1)
    qparams = _quantized_moe_params(cfg, seed=17)
    D = cfg.hidden_size
    I = cfg.intermediate_size
    rng = np.random.default_rng(9)
    for lp in qparams["layers"]:
        lp["shared_experts"] = {
            "gate_proj": quantize_tensor(
                jnp.asarray(rng.normal(size=(D, I)).astype(np.float32) * 0.05),
                bits=4, group_size=16,
            ),
            "up_proj": quantize_tensor(
                jnp.asarray(rng.normal(size=(D, I)).astype(np.float32) * 0.05),
                bits=4, group_size=16,
            ),
            "down_proj": quantize_tensor(
                jnp.asarray(rng.normal(size=(I, D)).astype(np.float32) * 0.05),
                bits=4, group_size=16,
            ),
        }
        lp["shared_expert_gate"] = jnp.asarray(
            rng.normal(size=(D, 1)).astype(np.float32) * 0.1
        )
    hp = stack_layer_params_hybrid(
        {**qparams, "layers": [dict(lp) for lp in qparams["layers"]]}
    )
    # shared experts must be [L]-stacked: a dict of stacked QTs
    sse = hp["layers"]["shared_experts"]
    assert isinstance(sse, dict)
    assert isinstance(sse["gate_proj"], QuantizedTensor)
    assert sse["gate_proj"].qweight.shape[0] == cfg.num_hidden_layers
    prompt = jnp.asarray([[1, 4, 2, 8]], jnp.int32)
    a = greedy_generate(qparams, cfg, prompt, max_new_tokens=8)
    b = greedy_generate(hp, cfg, prompt, max_new_tokens=8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grouped_fused_kernel_matches_two_launch(monkeypatch):
    """qmatmul_grouped_experts_fused (whole expert MLP in one launch —
    measured slower on-chip, so default-off, but kept as an A/B lever)
    must match the 2-launch grouped path."""
    import jax.tree_util as tu

    from qllm_tpu.models.stacked import prepare_stacked_tensor
    from qllm_tpu.ops.pallas_qmm import (
        grouped_fused_ok,
        qmatmul_grouped_experts,
        qmatmul_grouped_experts_fused,
    )
    from qllm_tpu.quant.qtensor import quantize_tensor

    monkeypatch.setenv("QLLM_TPU_FORCE_STACKED_KERNEL", "1")
    monkeypatch.setenv("QLLM_TPU_MOE_FUSED", "1")
    rng = np.random.default_rng(0)
    E, K1, K2 = 4, 512, 256
    gus = [
        quantize_tensor(
            jnp.asarray(
                rng.normal(size=(K1, 2 * K2)).astype(np.float32) * 0.05
            ),
            bits=4,
            group_size=128,
        )
        for _ in range(E)
    ]
    dns = [
        quantize_tensor(
            jnp.asarray(rng.normal(size=(K2, K1)).astype(np.float32) * 0.05),
            bits=4,
            group_size=128,
        )
        for _ in range(E)
    ]
    gu = prepare_stacked_tensor(
        tu.tree_map(lambda *xs: jnp.stack(xs), *gus),
        lane_quantum=128,
        planar=True,
        scale_store_dtype=jnp.bfloat16,
    )
    dn = prepare_stacked_tensor(
        tu.tree_map(lambda *xs: jnp.stack(xs), *dns),
        lane_quantum=128,
        planar=True,
        scale_store_dtype=jnp.bfloat16,
    )
    n = 4
    x = jnp.asarray(rng.normal(size=(n, K1)).astype(np.float32))
    ids = jnp.asarray([0, 2, 2, 3], jnp.int32)
    assert grouped_fused_ok(gu, dn, n, "silu")
    y = qmatmul_grouped_experts_fused(x, gu, dn, ids, act="silu")
    g2 = qmatmul_grouped_experts(x, gu, ids)
    gate, up = g2[:, :K2], g2[:, K2:]
    act = (
        gate.astype(jnp.float32) * jax.nn.sigmoid(gate.astype(jnp.float32))
    ) * up.astype(jnp.float32)
    yref = qmatmul_grouped_experts(act.astype(jnp.bfloat16), dn, ids)
    ref = np.asarray(yref, np.float32)
    err = np.max(np.abs(np.asarray(y, np.float32) - ref)) / np.max(
        np.abs(ref)
    )
    assert err < 0.02, err


def test_hybrid_numerics_bound():
    """Serving-scale numerics contract (reports/hybrid_numerics_r5.md):
    the shipping prep's per-step logits median rel err vs the
    conservative per-layer path stays within the committed bound, and
    the MoE hybrid path keeps teacher-forced greedy agreement on the
    CI shapes (on-chip: mixtral:4 agreement 1.0, p50 0.015)."""
    import importlib.util
    import os
    import sys

    spec = importlib.util.spec_from_file_location(
        "hybrid_numerics",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "hybrid_numerics.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["hybrid_numerics"] = spec.loader.exec_module(mod) or mod
    import faulthandler

    faulthandler.cancel_dump_traceback_later()  # the tool arms one
    r = mod.measure("tinymoe", 16)
    assert r["logits_rel_err_p50"] <= 0.05, r
    assert r["greedy_agreement"] >= 0.85, r
    r2 = mod.measure("tiny", 16)
    assert r2["logits_rel_err_p50"] <= 0.05, r2
