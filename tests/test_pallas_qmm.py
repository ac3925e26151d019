"""Pallas fused dequant+matmul vs the XLA reference oracle (interpret
mode on CPU; the same kernel compiles for TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from qllm_tpu.ops.pallas_qmm import qmatmul_pallas
from qllm_tpu.ops.ref_matmul import qmatmul_ref
from qllm_tpu.quant.qtensor import quantize_tensor


def _case(bits, K, N, g, M, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    x = rng.normal(size=(M, K)).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(w), bits=bits, group_size=g)
    return jnp.asarray(x), qt


@pytest.mark.parametrize(
    "bits,K,N,g,M",
    [
        (4, 256, 256, 128, 1),  # decode
        (4, 256, 256, 128, 16),  # small prefill
        (4, 512, 384, 128, 8),  # multi k/n blocks
        (4, 256, 256, -1, 4),  # per-channel groups
        (8, 256, 256, 64, 8),
        (2, 512, 256, 128, 8),
        (4, 1024, 256, 512, 8),  # large group spanning multiple k-blocks
    ],
)
def test_pallas_matches_ref(bits, K, N, g, M):
    x, qt = _case(bits, K, N, g, M)
    y_ref = np.asarray(qmatmul_ref(x, qt))
    y_pal = np.asarray(qmatmul_pallas(x, qt))
    assert y_pal.shape == y_ref.shape
    np.testing.assert_allclose(y_pal, y_ref, atol=2e-2, rtol=2e-2)


def test_pallas_batched_input():
    x, qt = _case(4, 256, 128, 128, 6)
    x3 = x.reshape(2, 3, 256)
    y = np.asarray(qmatmul_pallas(x3, qt))
    y_ref = np.asarray(qmatmul_ref(x3, qt))
    assert y.shape == (2, 3, 128)
    np.testing.assert_allclose(y, y_ref, atol=2e-2, rtol=2e-2)


def test_pallas_rejects_odd_bits():
    x, qt = _case(3, 256, 128, 128, 4)
    with pytest.raises(NotImplementedError):
        qmatmul_pallas(x, qt)


def test_w4a8_path_close_to_ref(monkeypatch):
    monkeypatch.setenv("QLLM_TPU_W4A8", "1")
    x, qt = _case(4, 512, 384, 128, 8, seed=5)
    y = np.asarray(qmatmul_pallas(x, qt))
    monkeypatch.delenv("QLLM_TPU_W4A8")
    y_ref = np.asarray(qmatmul_ref(x, qt))
    # int8 activations add ~0.5-1% relative noise
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y, y_ref, atol=0.02 * scale, rtol=0.05)


@pytest.mark.parametrize("planar", [False, True])
@pytest.mark.parametrize("scale_dtype", ["f32", "bf16"])
def test_fused_correction_stacked_matches_ref(monkeypatch, planar, scale_dtype):
    """v4/planar-fused kernels (in-kernel zero-point correction,
    optionally bf16 scale storage) vs the per-layer XLA reference."""
    monkeypatch.setenv("QLLM_TPU_FORCE_STACKED_KERNEL", "1")
    monkeypatch.setenv("QLLM_TPU_FUSED_CORR", "1")
    monkeypatch.setenv("QLLM_TPU_FUSED_CORR_V3", "1")
    import jax

    from qllm_tpu.models.stacked import stack_layer_params
    from qllm_tpu.ops.pallas_qmm import qmatmul_pallas_stacked

    K, N, g, L, M = 2048, 256, 128, 2, 4
    rng = np.random.default_rng(12)
    qts = [
        quantize_tensor(
            jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
            bits=4,
            group_size=g,
        )
        for _ in range(L)
    ]
    params = {
        "embed_tokens": jnp.zeros((8, 8)),
        "norm": jnp.ones((8,)),
        "layers": [{"q_proj": qt} for qt in qts],
    }
    sp = stack_layer_params(
        params,
        planar=planar,
        scale_store_dtype=jnp.bfloat16 if scale_dtype == "bf16" else jnp.float32,
    )
    stacked = sp["layers"]["q_proj"]
    assert stacked.planar == planar
    if scale_dtype == "bf16":
        assert stacked.scales.dtype == jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    for layer in range(L):
        y = np.asarray(qmatmul_pallas_stacked(x, stacked, jnp.int32(layer)))
        y_ref = np.asarray(qmatmul_ref(x, qts[layer]))
        tol = 2e-2 if scale_dtype == "f32" else 4e-2
        scale = np.abs(y_ref).max()
        np.testing.assert_allclose(y, y_ref, atol=tol * scale, rtol=tol)


def test_planar_full_k_kernel_matches_ref(monkeypatch):
    """Geometries with no blocked planar k-block (e.g. llama down_proj
    K=11008) take the single-k-step full-K planar kernel."""
    monkeypatch.setenv("QLLM_TPU_FORCE_STACKED_KERNEL", "1")
    from qllm_tpu.models.stacked import stack_layer_params
    from qllm_tpu.ops.pallas_qmm import (
        planar_bk,
        planar_full_ok,
        qmatmul_pallas_stacked,
    )

    K, N, g, L, M = 768, 256, 128, 2, 4
    assert planar_bk(K, g) is None and planar_full_ok(K, g)
    rng = np.random.default_rng(13)
    qts = [
        quantize_tensor(
            jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
            bits=4,
            group_size=g,
        )
        for _ in range(L)
    ]
    params = {
        "embed_tokens": jnp.zeros((8, 8)),
        "norm": jnp.ones((8,)),
        "layers": [{"q_proj": qt} for qt in qts],
    }
    sp = stack_layer_params(params)
    stacked = sp["layers"]["q_proj"]
    assert stacked.planar
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    for layer in range(L):
        y = np.asarray(qmatmul_pallas_stacked(x, stacked, jnp.int32(layer)))
        y_ref = np.asarray(qmatmul_ref(x, qts[layer]))
        np.testing.assert_allclose(y, y_ref, atol=2e-2, rtol=2e-2)


def test_planar_stacked_matches_ref(monkeypatch):
    """Planar 4-bit stacked kernel (interpret mode) vs per-layer ref."""
    monkeypatch.setenv("QLLM_TPU_FORCE_STACKED_KERNEL", "1")
    import dataclasses

    import jax

    from qllm_tpu.ops.pallas_qmm import planar_bk, qmatmul_pallas_stacked
    from qllm_tpu.quant.qtensor import planarize_packed, unplanarize_packed

    K, N, g, L, M = 2048, 256, 128, 2, 4
    assert planar_bk(K, g) is not None
    rng = np.random.default_rng(11)
    qts = [
        quantize_tensor(
            jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
            bits=4,
            group_size=g,
        )
        for _ in range(L)
    ]
    import jax.tree_util as tu

    stacked = tu.tree_map(lambda *xs: jnp.stack(xs), *qts)
    pq = jnp.stack(
        [planarize_packed(stacked.qweight[i], K) for i in range(L)]
    )
    # planarize/unplanarize are exact inverses
    np.testing.assert_array_equal(
        np.asarray(unplanarize_packed(pq[0], K)),
        np.asarray(stacked.qweight[0]),
    )
    stacked = dataclasses.replace(
        stacked,
        qweight=pq,
        scales=stacked.scales.astype(jnp.float32),
        zeros=stacked.zeros.astype(jnp.float32),
        planar=True,
    )
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    for layer in range(L):
        y = np.asarray(
            qmatmul_pallas_stacked(x, stacked, jnp.int32(layer))
        )
        y_ref = np.asarray(qmatmul_ref(x, qts[layer]))
        np.testing.assert_allclose(y, y_ref, atol=2e-2, rtol=2e-2)


def test_planar_stacked_inadmissible_tuned_bk_falls_back(monkeypatch):
    """A tuned bk below the planar quantum (lcm(256, 16g)) must degrade
    to the largest admissible k-block, not raise (regression: the shipped
    (bn=512, bk=1024) pick for 4096x22016 crashed f32-scale planar
    serving, where fuse_corr's full-K path is unavailable)."""
    monkeypatch.setenv("QLLM_TPU_FORCE_STACKED_KERNEL", "1")
    import dataclasses

    from qllm_tpu.ops import autotune
    from qllm_tpu.ops.pallas_qmm import planar_bk, qmatmul_pallas_stacked
    from qllm_tpu.quant.qtensor import planarize_packed

    K, N, g, L, M = 2048, 256, 128, 2, 4
    # quantum = lcm(256, 16*128) = 2048 -> bk=1024 admits no block
    assert planar_bk(K, g, 1024) is None and planar_bk(K, g, K) == 2048
    monkeypatch.setattr(autotune, "lookup", lambda *a, **k: (256, 1024))
    rng = np.random.default_rng(13)
    qts = [
        quantize_tensor(
            jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
            bits=4,
            group_size=g,
        )
        for _ in range(L)
    ]
    import jax.tree_util as tu

    stacked = tu.tree_map(lambda *xs: jnp.stack(xs), *qts)
    stacked = dataclasses.replace(
        stacked,
        qweight=jnp.stack(
            [planarize_packed(stacked.qweight[i], K) for i in range(L)]
        ),
        scales=stacked.scales.astype(jnp.float32),
        zeros=stacked.zeros.astype(jnp.float32),
        planar=True,
    )
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    y = np.asarray(qmatmul_pallas_stacked(x, stacked, jnp.int32(0)))
    y_ref = np.asarray(qmatmul_ref(x, qts[0]))
    np.testing.assert_allclose(y, y_ref, atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("bits", [3, 5, 6, 7])
@pytest.mark.parametrize("fuse", [False, True])
def test_odd_bit_stacked_kernel_matches_ref(monkeypatch, bits, fuse):
    """Fused bit-plane decode kernel (3/5/6/7-bit) vs the per-layer XLA
    reference — VERDICT item 4: odd widths serve at packed bytes."""
    monkeypatch.setenv("QLLM_TPU_FORCE_STACKED_KERNEL", "1")
    if fuse:
        monkeypatch.setenv("QLLM_TPU_FUSED_CORR_V3", "1")
    else:
        monkeypatch.delenv("QLLM_TPU_FUSED_CORR_V3", raising=False)
    from qllm_tpu.models.stacked import stack_layer_params
    from qllm_tpu.ops.pallas_qmm import (
        odd_stacked_kernel_ok,
        qmatmul_pallas_stacked,
    )

    K, N, g, L, M = 1024, 256, 128, 2, 4
    assert odd_stacked_kernel_ok(K, g)
    rng = np.random.default_rng(20 + bits)
    qts = [
        quantize_tensor(
            jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
            bits=bits,
            group_size=g,
        )
        for _ in range(L)
    ]
    params = {
        "embed_tokens": jnp.zeros((8, 8)),
        "norm": jnp.ones((8,)),
        "layers": [{"q_proj": qt} for qt in qts],
    }
    sp = stack_layer_params(params)
    stacked = sp["layers"]["q_proj"]
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    import qllm_tpu.ops.pallas_qmm as pq

    calls = []
    orig = pq._qmm_2d_stacked
    monkeypatch.setattr(
        pq, "_qmm_2d_stacked", lambda *a, **k: calls.append(1) or orig(*a, **k)
    )
    for layer in range(L):
        y = np.asarray(qmatmul_pallas_stacked(x, stacked, jnp.int32(layer)))
        y_ref = np.asarray(qmatmul_ref(x, qts[layer]))
        scale = np.abs(y_ref).max()
        np.testing.assert_allclose(y, y_ref, atol=2e-2 * scale, rtol=2e-2)
    assert calls, "odd-bit path fell back to the XLA reference"


def test_odd_bit_stacked_kernel_full_k(monkeypatch):
    """Geometry whose only admissible k-block is full-K (per-channel
    grouping -1) still takes the kernel."""
    monkeypatch.setenv("QLLM_TPU_FORCE_STACKED_KERNEL", "1")
    from qllm_tpu.models.stacked import stack_layer_params
    from qllm_tpu.ops.pallas_qmm import qmatmul_pallas_stacked

    K, N, L, M = 512, 256, 2, 2
    rng = np.random.default_rng(31)
    qts = [
        quantize_tensor(
            jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
            bits=3,
            group_size=-1,
        )
        for _ in range(L)
    ]
    params = {
        "embed_tokens": jnp.zeros((8, 8)),
        "norm": jnp.ones((8,)),
        "layers": [{"q_proj": qt} for qt in qts],
    }
    sp = stack_layer_params(params)
    stacked = sp["layers"]["q_proj"]
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    for layer in range(L):
        y = np.asarray(qmatmul_pallas_stacked(x, stacked, jnp.int32(layer)))
        y_ref = np.asarray(qmatmul_ref(x, qts[layer]))
        scale = np.abs(y_ref).max()
        np.testing.assert_allclose(y, y_ref, atol=2e-2 * scale, rtol=2e-2)


def test_fused_norm_matches_xla_prenorm(monkeypatch):
    """norm_w fusion (in-kernel rms_norm on the full-K planar path, XLA
    pre-normalize on every other path) vs explicit rms_norm + matmul."""
    monkeypatch.setenv("QLLM_TPU_FORCE_STACKED_KERNEL", "1")
    from qllm_tpu.models.stacked import stack_layer_params
    from qllm_tpu.ops.pallas_qmm import (
        _rms_norm_rows,
        planar_full_ok,
        qmatmul_pallas_stacked,
    )

    K, N, g, L, M = 768, 256, 128, 2, 4
    assert planar_full_ok(K, g)
    rng = np.random.default_rng(21)
    qts = [
        quantize_tensor(
            jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
            bits=4,
            group_size=g,
        )
        for _ in range(L)
    ]
    params = {
        "embed_tokens": jnp.zeros((8, 8)),
        "norm": jnp.ones((8,)),
        "layers": [{"q_proj": qt} for qt in qts],
    }
    for planar in (True, False):  # full-K in-kernel vs XLA-fallback route
        sp = stack_layer_params(dict(params), planar=planar)
        stacked = sp["layers"]["q_proj"]
        nw = jnp.asarray(
            rng.normal(size=(L, K)).astype(np.float32) * 0.2 + 1.0
        )
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        for layer in range(L):
            y = np.asarray(
                qmatmul_pallas_stacked(
                    x, stacked, jnp.int32(layer), norm_w=nw, norm_eps=1e-6
                )
            )
            xn = _rms_norm_rows(x, nw[layer], 1e-6)
            y_ref = np.asarray(qmatmul_ref(xn, qts[layer]))
            scale = np.abs(y_ref).max()
            np.testing.assert_allclose(y, y_ref, atol=2e-2 * scale, rtol=2e-2)


def test_normed_x_view_matches_unfused_forward():
    """StackedLayerView consumes the NormedX marker identically to
    apply_norm + apply (fallback path, no forced kernel)."""
    from qllm_tpu.models.llama import ModelConfig, rms_norm
    from qllm_tpu.models.stacked import (
        NormedX,
        StackedLayerView,
        stack_layer_params,
    )

    K, N, g, L = 256, 128, 128, 2
    rng = np.random.default_rng(22)
    qts = [
        quantize_tensor(
            jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
            bits=4,
            group_size=g,
        )
        for _ in range(L)
    ]
    nws = jnp.asarray(rng.normal(size=(L, K)).astype(np.float32) * 0.2 + 1.0)
    params = {
        "embed_tokens": jnp.zeros((8, 8)),
        "norm": jnp.ones((8,)),
        "layers": [
            {"up_proj": qt, "input_layernorm": nws[i]}
            for i, qt in enumerate(qts)
        ],
    }
    cfg = ModelConfig(
        vocab_size=8,
        hidden_size=K,
        intermediate_size=N,
        num_hidden_layers=L,
        num_attention_heads=4,
        num_key_value_heads=4,
    )
    sp = stack_layer_params(params)
    h = jnp.asarray(rng.normal(size=(1, 1, K)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    for layer in range(L):
        pv = StackedLayerView(sp["layers"], jnp.int32(layer), cfg)
        nx = pv.fused_norm_arg(h, "input_layernorm", cfg)
        assert isinstance(nx, NormedX)
        y_marker = np.asarray(pv.apply("up_proj", nx), np.float32)
        xn = rms_norm(h, nws[layer], cfg.rms_norm_eps)
        y_ref = np.asarray(pv.apply("up_proj", xn), np.float32)
        scale = np.abs(y_ref).max()
        np.testing.assert_allclose(
            y_marker, y_ref, atol=2e-2 * scale, rtol=2e-2
        )


def test_w4a8_stacked_planar_full_matches_ref(monkeypatch):
    """ServeConfig.w4a8 path: per-token int8 activations through the
    full-K planar stacked kernel at the batch-32 (compute-bound) regime
    — within int8-activation tolerance of the W4A16 path and the XLA
    reference (reference role: the int8-activation GEMMs of
    csrc/ort_cuda)."""
    monkeypatch.setenv("QLLM_TPU_FORCE_STACKED_KERNEL", "1")
    import qllm_tpu.ops.pallas_qmm as pq
    from qllm_tpu.models.stacked import stack_layer_params
    from qllm_tpu.ops.pallas_qmm import (
        planar_bk,
        planar_full_ok,
        qmatmul_pallas_stacked,
    )

    K, N, g, L, M = 1280, 384, 64, 2, 32
    # this geometry has no blocked planar k-block -> full-K kernel
    assert planar_bk(K, g) is None and planar_full_ok(K, g)
    rng = np.random.default_rng(21)
    qts = [
        quantize_tensor(
            jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
            bits=4,
            group_size=g,
        )
        for _ in range(L)
    ]
    params = {
        "embed_tokens": jnp.zeros((8, 8)),
        "norm": jnp.ones((8,)),
        "layers": [{"q_proj": qt} for qt in qts],
    }
    sp = stack_layer_params(params)
    stacked = sp["layers"]["q_proj"]
    assert stacked.planar
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    y16 = [
        np.asarray(qmatmul_pallas_stacked(x, stacked, jnp.int32(i)))
        for i in range(L)
    ]
    monkeypatch.setenv("QLLM_TPU_W4A8", "1")
    # the env flag is read at trace time: drop traces cached without it
    pq._qmm_2d_stacked.clear_cache()
    try:
        for layer in range(L):
            y8 = np.asarray(
                qmatmul_pallas_stacked(x, stacked, jnp.int32(layer))
            )
            y_ref = np.asarray(qmatmul_ref(x, qts[layer]))
            scale = np.abs(y_ref).max()
            # int8 activations add ~1% relative noise on top of W4
            np.testing.assert_allclose(
                y8, y_ref, atol=0.03 * scale, rtol=0.05
            )
            np.testing.assert_allclose(
                y8, y16[layer], atol=0.03 * scale, rtol=0.05
            )
    finally:
        pq._qmm_2d_stacked.clear_cache()


def test_w4a8_v3_stacked_matches_ref(monkeypatch):
    """W4A8 on the packed v3 (non-planar) family — the layout TP shards
    run (row sharding splits the planar word). External zero-point
    correction on x8 sums + per-token scale outside."""
    monkeypatch.setenv("QLLM_TPU_FORCE_STACKED_KERNEL", "1")
    import qllm_tpu.ops.pallas_qmm as pq
    from qllm_tpu.models.stacked import stack_layer_params
    from qllm_tpu.ops.pallas_qmm import qmatmul_pallas_stacked

    K, N, g, L, M = 1536, 384, 64, 2, 8
    rng = np.random.default_rng(23)
    qts = [
        quantize_tensor(
            jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
            bits=4,
            group_size=g,
        )
        for _ in range(L)
    ]
    params = {
        "embed_tokens": jnp.zeros((8, 8)),
        "norm": jnp.ones((8,)),
        "layers": [{"q_proj": qt} for qt in qts],
    }
    # planar=False + f32 scales: the prepare_tp_params stacking layout
    sp = stack_layer_params(params, planar=False, lane_quantum=1)
    stacked = sp["layers"]["q_proj"]
    assert not stacked.planar
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    y16 = [
        np.asarray(qmatmul_pallas_stacked(x, stacked, jnp.int32(i)))
        for i in range(L)
    ]
    monkeypatch.setenv("QLLM_TPU_W4A8", "1")
    pq._qmm_2d_stacked.clear_cache()
    try:
        for layer in range(L):
            y8 = np.asarray(
                qmatmul_pallas_stacked(x, stacked, jnp.int32(layer))
            )
            y_ref = np.asarray(qmatmul_ref(x, qts[layer]))
            scale = np.abs(y_ref).max()
            np.testing.assert_allclose(
                y8, y_ref, atol=0.03 * scale, rtol=0.05
            )
            np.testing.assert_allclose(
                y8, y16[layer], atol=0.03 * scale, rtol=0.05
            )
    finally:
        pq._qmm_2d_stacked.clear_cache()


@pytest.mark.parametrize("K,N,g", [(768, 256, 128), (2048, 256, 128)])
@pytest.mark.parametrize("M", [64, 256])
def test_planar_stacked_prefill_matches_ref(monkeypatch, K, N, g, M):
    """M>32 routes through the bm-blocked stacked planar kernels
    (K=768: full-K variant with VMEM-fit sizing; K=2048: blocked) —
    prefill no longer pays the XLA unplanarize fallback (measured
    +37% at T=2048, 3.0x at T=512 on v5e)."""
    monkeypatch.setenv("QLLM_TPU_FORCE_STACKED_KERNEL", "1")
    import dataclasses

    from qllm_tpu.quant.qtensor import planarize_packed
    from qllm_tpu.ops.pallas_qmm import qmatmul_pallas_stacked

    rng = np.random.default_rng(29)
    qts = [
        quantize_tensor(
            jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
            bits=4,
            group_size=g,
        )
        for _ in range(2)
    ]
    st = dataclasses.replace(
        qts[0],
        qweight=jnp.stack([planarize_packed(q.qweight, K) for q in qts]),
        scales=jnp.stack([q.scales.astype(jnp.bfloat16) for q in qts]),
        zeros=jnp.stack(
            [(q.zeros * q.scales).astype(jnp.bfloat16) for q in qts]
        ),
        planar=True,
        zeros_prefolded=True,
    )
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    for layer in range(2):
        y = np.asarray(qmatmul_pallas_stacked(x, st, jnp.int32(layer)))
        y_ref = np.asarray(qmatmul_ref(x, qts[layer]))
        scale = np.abs(y_ref).max()
        np.testing.assert_allclose(y, y_ref, atol=4e-2 * scale, rtol=4e-2)


@pytest.mark.parametrize("fuse", [True, False])
def test_planar_prefill_relaxed_bk_matches_ref(monkeypatch, fuse):
    """Relaxed-quantum blocked planar kernel (planar_bk_relaxed): serves
    M>32 when the 16g quantum rejects the geometry AND full-K is
    ineligible (here forced via QLLM_TPU_QMM_FULLK_MAX=0 / unfused
    correction). K=2304 = 2^8*9 has no 2048-multiple divisor but
    bk=768 divides it (gpbh=3 whole-group scale blocks — 4D reshape
    exempts them from Mosaic's 8-sublane block quantum)."""
    import dataclasses

    from qllm_tpu.ops import pallas_qmm as pq
    from qllm_tpu.ops.pallas_qmm import qmatmul_pallas_stacked
    from qllm_tpu.quant.qtensor import planarize_packed

    monkeypatch.setenv("QLLM_TPU_FORCE_STACKED_KERNEL", "1")
    if fuse:
        monkeypatch.setenv("QLLM_TPU_QMM_FULLK_MAX", "0")
    K, N, g, M = 2304, 256, 128, 64
    assert pq.planar_bk(K, g, K) is None
    assert pq.planar_bk_relaxed(K, g, 2048) == 768
    rng = np.random.default_rng(31)
    qts = [
        quantize_tensor(
            jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
            bits=4,
            group_size=g,
        )
        for _ in range(2)
    ]
    st = dataclasses.replace(
        qts[0],
        qweight=jnp.stack([planarize_packed(q.qweight, K) for q in qts]),
        scales=jnp.stack(
            [
                q.scales.astype(jnp.bfloat16 if fuse else jnp.float32)
                for q in qts
            ]
        ),
        zeros=(
            jnp.stack(
                [(q.zeros * q.scales).astype(jnp.bfloat16) for q in qts]
            )
            if fuse
            else jnp.stack([q.zeros for q in qts])
        ),
        planar=True,
        zeros_prefolded=fuse,
    )
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    try:
        for layer in range(2):
            y = np.asarray(qmatmul_pallas_stacked(x, st, jnp.int32(layer)))
            y_ref = np.asarray(qmatmul_ref(x, qts[layer]))
            scale = np.abs(y_ref).max()
            np.testing.assert_allclose(y, y_ref, atol=4e-2 * scale, rtol=4e-2)
    finally:
        pq._qmm_2d_stacked.clear_cache()
