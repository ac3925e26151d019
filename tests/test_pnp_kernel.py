"""Fused proj->residual+rmsnorm->proj kernel (ops/pallas_qmm
qmatmul_pnp_stacked): numeric parity vs the reference path in
interpret mode. The kernel measured slower than separate launches at
the 7B decode shape (reports/ceiling_r4.md #3) and does not ship in
the serving path, but stays correct-in-tree for future scheduling
work."""

import dataclasses

import jax
import jax.numpy as jnp
import jax.tree_util as tu
import numpy as np

from qllm_tpu.ops import pallas_qmm as pq
from qllm_tpu.ops.ref_matmul import qmatmul
from qllm_tpu.quant.qtensor import planarize_packed, quantize_tensor

L, g = 3, 128
K1, D, N2 = 512, 512, 1024
EPS = 1e-6


def _build(rng, K, N):
    qt = quantize_tensor(
        jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
        bits=4,
        group_size=g,
    )
    st = tu.tree_map(lambda a: jnp.stack([a] * L), qt)
    zs = st.zeros * st.scales
    pqw = jnp.stack([planarize_packed(st.qweight[i], K) for i in range(L)])
    return qt, dataclasses.replace(
        st,
        qweight=pqw,
        scales=st.scales.astype(jnp.bfloat16),
        zeros=zs.astype(jnp.bfloat16),
        planar=True,
        zeros_prefolded=True,
    )


def test_pnp_matches_reference_path():
    rng = np.random.default_rng(0)
    qt1, st1 = _build(rng, K1, D)
    qt2, st2 = _build(rng, D, N2)
    assert pq.pnp_stacked_ok(st1, st2)
    nw = jnp.asarray(rng.normal(size=(L, D)).astype(np.float32) * 0.1 + 1.0)
    x1 = jnp.asarray(rng.normal(size=(2, K1)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(2, D)).astype(np.float32))
    for layer in range(L):
        hn, y2 = pq.qmatmul_pnp_stacked(
            x1, h, st1, st2, nw, jnp.int32(layer), EPS
        )
        hn_ref = np.asarray(h) + np.asarray(qmatmul(x1, qt1))
        var = (hn_ref**2).mean(-1, keepdims=True)
        x2 = hn_ref / np.sqrt(var + EPS) * np.asarray(nw[layer])[None]
        y2_ref = np.asarray(qmatmul(jnp.asarray(x2), qt2))
        e1 = np.abs(np.asarray(hn) - hn_ref).max() / np.abs(hn_ref).max()
        e2 = np.abs(np.asarray(y2, np.float32) - y2_ref).max() / np.abs(
            y2_ref
        ).max()
        assert e1 < 2e-2, (layer, e1)
        assert e2 < 3e-2, (layer, e2)


def test_pnp_eligibility_guards():
    rng = np.random.default_rng(1)
    _, st1 = _build(rng, K1, D)
    _, st2 = _build(rng, D, N2)
    # padded proj1 columns would corrupt the residual stream
    bad = dataclasses.replace(st1, out_features=D - 128)
    assert not pq.pnp_stacked_ok(bad, st2)
    # width mismatch between proj1 out and proj2 in
    _, st_narrow = _build(rng, 256, N2)
    assert not pq.pnp_stacked_ok(st1, st_narrow)
