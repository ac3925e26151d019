"""Multi-device (8x virtual CPU) sharding tests.

The TPU-native replacement for the reference's hand-rolled multi-GPU
queues (SURVEY.md §2.3): data-parallel Hessian collection becomes a
sharded jit (XLA inserts the psum), tensor-parallel decode becomes
NamedSharding + one jitted step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, forward, init_params
from qllm_tpu.models.generate import make_cache
from qllm_tpu.parallel import make_mesh, shard_cache, shard_params
from qllm_tpu.quant.frame import embed_inputs
from qllm_tpu.quant.hessian import collect_block_hessians
from qllm_tpu.utils.testing import random_quantized_params

CFG = TINY_LLAMA_TEST_CONFIG

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_mesh_shapes():
    mesh = make_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    mesh = make_mesh()  # default: all tp
    assert mesh.shape["tp"] == jax.device_count()


def test_data_parallel_hessian_matches_local():
    """Hessians from dp-sharded calibration must equal the local ones —
    the psum-based replacement of the reference's queue-reduce
    (qllm_hessian.py:172-204)."""
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (8, 16)), jnp.int32)
    h, cos, sin, mask = embed_inputs(params, CFG, tokens)
    local = collect_block_hessians(
        params["layers"][0], CFG, h, cos, sin, mask, chunk=8
    )

    mesh = make_mesh(dp=8, tp=1)
    with mesh:
        shard = NamedSharding(mesh, P("dp"))
        hs = jax.device_put(h, NamedSharding(mesh, P("dp", None, None)))
        cs = jax.device_put(cos, NamedSharding(mesh, P("dp", None, None)))
        ss = jax.device_put(sin, NamedSharding(mesh, P("dp", None, None)))
        ms = jax.device_put(mask, NamedSharding(mesh, P("dp", None, None, None)))
        dist = collect_block_hessians(
            params["layers"][0], CFG, hs, cs, ss, ms, chunk=8
        )
    for name in local:
        np.testing.assert_allclose(
            np.asarray(local[name]), np.asarray(dist[name]), rtol=2e-4, atol=1e-4
        )


def test_tensor_parallel_decode_matches_single():
    """Sharded quantized decode == unsharded decode (same weights)."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG, num_attention_heads=8, num_key_value_heads=4
    )
    params = random_quantized_params(cfg, jax.random.key(1), bits=4, group_size=32)
    cache = make_cache(cfg, 2, 16, quantized_kv=True)
    tok = jnp.ones((2, 1), jnp.int32)

    logits_local, _ = jax.jit(
        lambda p, t, c: forward(p, cfg, t, c, pos=jnp.int32(0)),
    )(params, tok, cache)

    mesh = make_mesh(dp=2, tp=4)
    with mesh:
        sp = shard_params(params, mesh)
        sc = shard_cache(cache, mesh)
        st = jax.device_put(tok, NamedSharding(mesh, P("dp", None)))
        logits_dist, _ = jax.jit(
            lambda p, t, c: forward(p, cfg, t, c, pos=jnp.int32(0)),
        )(sp, st, sc)
    np.testing.assert_allclose(
        np.asarray(logits_local),
        np.asarray(logits_dist),
        atol=3e-2,
        rtol=3e-2,
    )


def test_param_sharding_layout():
    mesh = make_mesh(dp=2, tp=4)
    import dataclasses

    cfg = dataclasses.replace(
        CFG, num_attention_heads=8, num_key_value_heads=4
    )
    params = random_quantized_params(cfg, jax.random.key(2), bits=4, group_size=32)
    sp = shard_params(params, mesh)
    qt = sp["layers"][0]["q_proj"]
    # column-parallel: N sharded over tp
    assert qt.qweight.sharding.spec == P(None, "tp")
    rt = sp["layers"][0]["o_proj"]
    assert rt.qweight.sharding.spec == P("tp", None)


def test_stacked_params_sharded_decode():
    """Sharding also covers [L]-stacked params (scan serving path)."""
    import dataclasses

    from qllm_tpu.models.llama import forward
    from qllm_tpu.models.stacked import stack_layer_params

    cfg = dataclasses.replace(
        CFG, num_attention_heads=8, num_key_value_heads=4
    )
    params = random_quantized_params(cfg, jax.random.key(3), bits=4, group_size=32)
    sp_local = stack_layer_params(params)
    cache = make_cache(cfg, 2, 16, quantized_kv=True)
    tok = jnp.ones((2, 1), jnp.int32)
    logits_local, _ = jax.jit(
        lambda p, t, c: forward(p, cfg, t, c, pos=jnp.int32(0))
    )(sp_local, tok, cache)

    mesh = make_mesh(dp=2, tp=4)
    with mesh:
        sp = shard_params(sp_local, mesh)
        # stacking fuses q/k/v into qkv_proj (models.stacked._FUSE_GROUPS)
        qt = sp["layers"]["qkv_proj"]
        assert qt.qweight.sharding.spec == P(None, None, "tp")
        gu = sp["layers"]["gateup_proj"]
        assert gu.qweight.sharding.spec == P(None, None, "tp")
        sc = shard_cache(cache, mesh)
        st = jax.device_put(tok, NamedSharding(mesh, P("dp", None)))
        logits_dist, _ = jax.jit(
            lambda p, t, c: forward(p, cfg, t, c, pos=jnp.int32(0))
        )(sp, st, sc)
    np.testing.assert_allclose(
        np.asarray(logits_local),
        np.asarray(logits_dist),
        atol=3e-2,
        rtol=3e-2,
    )


def test_sequence_parallel_decode_attention():
    """KV cache sharded on the sequence axis over 4 devices: the
    log-sum-exp merge of per-shard Pallas partials must match the
    single-device fused kernel AND the float reference."""
    from jax.sharding import Mesh

    from qllm_tpu.ops.pallas_attention import decode_attention_pallas
    from qllm_tpu.parallel import sp_cache_pspecs, sp_decode_attention

    rng = np.random.default_rng(11)
    L, B, Hkv, S, d, n_rep = 2, 2, 2, 512, 128, 2
    H = Hkv * n_rep
    q = rng.normal(size=(B, H, d)).astype(np.float32)
    k = rng.integers(-127, 128, (L, B, Hkv, S, d)).astype(np.int8)
    v = rng.integers(-127, 128, (L, B, Hkv, S, d)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, (L, B, Hkv, S)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, (L, B, Hkv, S)).astype(np.float32)
    # 100: mid-shard-0; 384: exactly 3 shards; 509: last shard partial
    lengths = np.array([100, 509], np.int32)
    layer = jnp.int32(1)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    kv_spec, sc_spec = sp_cache_pspecs("sp")
    kc = jax.device_put(jnp.asarray(k), NamedSharding(mesh, kv_spec))
    vc = jax.device_put(jnp.asarray(v), NamedSharding(mesh, kv_spec))
    kss = jax.device_put(jnp.asarray(ks), NamedSharding(mesh, sc_spec))
    vss = jax.device_put(jnp.asarray(vs), NamedSharding(mesh, sc_spec))

    out = np.asarray(
        sp_decode_attention(
            jnp.asarray(q), kc, vc, kss, vss,
            jnp.asarray(lengths), layer, mesh,
        )
    )
    single = np.asarray(
        decode_attention_pallas(
            jnp.asarray(q),
            jnp.asarray(k),
            jnp.asarray(v),
            jnp.asarray(ks),
            jnp.asarray(vs),
            jnp.asarray(lengths),
            layer=layer,
        )
    )
    np.testing.assert_allclose(out, single, atol=2e-2, rtol=2e-2)
