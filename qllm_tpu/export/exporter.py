"""Model export with numeric verification.

The reference exports ONNX decoder / decoder_with_past / merged graphs
and verifies ORT-vs-torch parity < 1e-2 (utils/onnx/exporter.py:11-128,
merge_encoder_decoder.py). The TPU-native serialization format is
**StableHLO via jax.export**: two functions are emitted —

  * ``prefill.stablehlo``  — [B, T] tokens -> logits + filled KV cache
  * ``decode.stablehlo``   — one token + cache + pos -> logits + cache

(no ONNX ``If``-node merge needed: the two entry points replace the
``use_cache_branch`` trick). ``verify_correctness`` round-trips the
serialized artifacts and checks max-abs logits error < 1e-2 for a
prefill and one decode step, mirroring the reference gate
(exporter.py:120-128). When the ``onnx`` package is available an
ONNX MatMulNBits export can be added on top; this environment ships
without it.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.generate import make_cache
from ..models.llama import ModelConfig, forward
from ..utils.logger import get_logger

logger = get_logger()

__all__ = ["export_model", "verify_correctness"]

_ATOL = 1e-2  # reference parity gate (exporter.py:120-128)

_SERIALIZATION_REGISTERED = False


def _register_serialization() -> None:
    """jax.export needs (de)serializers for our custom pytree nodes.
    Auxdata for register_dataclass nodes is the tuple of meta fields."""
    global _SERIALIZATION_REGISTERED
    if _SERIALIZATION_REGISTERED:
        return
    from jax import export as jexport

    from ..ops.kv_cache import QuantizedKVCache
    from ..quant.qtensor import QuantizedTensor

    def ser(aux) -> bytes:
        return json.dumps(list(aux)).encode()

    def des(b: bytes):
        return tuple(json.loads(b.decode()))

    for cls_, name in (
        (QuantizedTensor, "qllm_tpu.QuantizedTensor"),
        (QuantizedKVCache, "qllm_tpu.QuantizedKVCache"),
    ):
        try:
            jexport.register_pytree_node_serialization(
                cls_,
                serialized_name=name,
                serialize_auxdata=ser,
                deserialize_auxdata=des,
            )
        except ValueError:
            pass  # already registered
    _SERIALIZATION_REGISTERED = True


def _entry_fns(cfg: ModelConfig, quantized_kv: bool):
    def prefill_fn(params, tokens, cache):
        logits, cache = forward(params, cfg, tokens, cache, pos=jnp.int32(0))
        return logits, cache

    def decode_fn(params, token, cache, pos):
        logits, cache = forward(params, cfg, token, cache, pos=pos)
        return logits, cache

    return prefill_fn, decode_fn


def export_model(
    params: Dict[str, Any],
    cfg: ModelConfig,
    path: str,
    batch: int = 1,
    prompt_len: int = 64,
    max_seq: int = 256,
    quantized_kv: bool = True,
    tokenizer=None,
    verify: bool = True,
) -> None:
    os.makedirs(path, exist_ok=True)
    from jax import export as jexport

    _register_serialization()
    prefill_fn, decode_fn = _entry_fns(cfg, quantized_kv)
    cache = make_cache(cfg, batch, max_seq, quantized_kv)
    tokens = jnp.zeros((batch, prompt_len), jnp.int32)
    token1 = jnp.zeros((batch, 1), jnp.int32)
    pos = jnp.int32(prompt_len)

    exp_prefill = jexport.export(jax.jit(prefill_fn))(params, tokens, cache)
    with open(os.path.join(path, "prefill.stablehlo"), "wb") as f:
        f.write(exp_prefill.serialize())
    exp_decode = jexport.export(jax.jit(decode_fn))(params, token1, cache, pos)
    with open(os.path.join(path, "decode.stablehlo"), "wb") as f:
        f.write(exp_decode.serialize())
    with open(os.path.join(path, "export_config.json"), "w") as f:
        json.dump(
            {
                "format": "stablehlo",
                "batch": batch,
                "prompt_len": prompt_len,
                "max_seq": max_seq,
                "quantized_kv": quantized_kv,
                "entry_points": ["prefill", "decode"],
            },
            f,
            indent=2,
        )
    logger.info(f"exported prefill+decode StableHLO to {path}")
    if verify:
        verify_correctness(params, cfg, path, batch, prompt_len, max_seq, quantized_kv)


def verify_correctness(
    params,
    cfg: ModelConfig,
    path: str,
    batch: int = 1,
    prompt_len: int = 64,
    max_seq: int = 256,
    quantized_kv: bool = True,
    seed: int = 0,
) -> float:
    """Deserialize the artifacts and compare against the live model for
    a prefill and one decode step. Returns max abs error; raises if the
    reference threshold (1e-2) is exceeded."""
    from jax import export as jexport

    _register_serialization()
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (batch, prompt_len)), jnp.int32
    )
    cache = make_cache(cfg, batch, max_seq, quantized_kv)
    prefill_fn, decode_fn = _entry_fns(cfg, quantized_kv)

    with open(os.path.join(path, "prefill.stablehlo"), "rb") as f:
        exp_prefill = jexport.deserialize(f.read())
    with open(os.path.join(path, "decode.stablehlo"), "rb") as f:
        exp_decode = jexport.deserialize(f.read())

    ref_logits, ref_cache = jax.jit(prefill_fn)(params, tokens, cache)
    got_logits, got_cache = exp_prefill.call(params, tokens, cache)
    err = float(jnp.max(jnp.abs(ref_logits - got_logits)))

    token1 = jnp.argmax(ref_logits[:, -1:], axis=-1).astype(jnp.int32)
    pos = jnp.int32(prompt_len)
    ref2, _ = jax.jit(decode_fn)(params, token1, ref_cache, pos)
    got2, _ = exp_decode.call(params, token1, got_cache, pos)
    err = max(err, float(jnp.max(jnp.abs(ref2 - got2))))

    if err > _ATOL:
        raise AssertionError(
            f"export verification failed: max abs err {err:.4g} > {_ATOL}"
        )
    logger.info(f"export verified: max abs logits err {err:.4g} < {_ATOL}")

    # cross-engine check (reference verifies torch vs onnxruntime,
    # exporter.py:68-128): the EXPORTED artifact's prefill logits vs a
    # pure-numpy forward — independent of XLA end to end. bf16 model vs
    # f32 numpy accumulates ~1e-2 relative difference; threshold is
    # relative to the logit scale.
    try:
        from ..eval.numpy_ref import np_forward_logits

        np_logits = np_forward_logits(params, cfg, np.asarray(tokens))
        scale = max(float(np.max(np.abs(np_logits))), 1e-6)
        xerr = float(jnp.max(jnp.abs(got_logits - np_logits))) / scale
        if xerr > 0.05:
            raise AssertionError(
                f"cross-engine verification failed: exported vs numpy "
                f"rel err {xerr:.4g} > 0.05"
            )
        logger.info(
            f"export cross-engine verified vs numpy: rel err {xerr:.4g}"
        )
    except NotImplementedError as e:
        logger.warning(
            f"cross-engine numpy check skipped for this config: {e}"
        )
    return err
