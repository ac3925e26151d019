"""Plain-XLA quantized matmul: the correctness oracle and CPU fallback.

Analog of the reference's pure-torch fallback ``DequantizeLinearBlockWise``
(quant_linear_gptq.py:13-52): unpack -> dequant -> dot. XLA fuses the
dequant elementwise chain into the dot's operand read on TPU, so this is
already decent; the Pallas path exists to beat it to roofline.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..quant.qtensor import QuantizedTensor, unpack_rows

__all__ = ["qmatmul_ref", "qmatmul", "dequant_ref"]


def dequant_ref(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Unpack + dequantize to dense [K, N] (permuted row order)."""
    q = unpack_rows(qt.qweight, qt.bits, qt.in_features)
    g = qt.effective_group_size
    K, N = qt.in_features, qt.out_features
    scales = qt.scales.astype(jnp.float32)
    zeros = qt.zeros.astype(jnp.float32)
    w = (q.reshape(K // g, g, N).astype(jnp.float32) - zeros[:, None, :]) * scales[
        :, None, :
    ]
    return w.reshape(K, N).astype(dtype)


def _apply_perm(x: jax.Array, qt: QuantizedTensor) -> jax.Array:
    if qt.perm is None:
        return x
    return jnp.take(x, qt.perm, axis=-1)


def qmatmul_ref(
    x: jax.Array, qt: QuantizedTensor, bias: Optional[jax.Array] = None
) -> jax.Array:
    """y = x @ dequant(qt) (+ bias). x: [..., K] -> [..., N]."""
    w = dequant_ref(qt, dtype=jnp.bfloat16)
    xp = _apply_perm(x, qt)
    y = jnp.dot(
        xp.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias
    return y


def _use_pallas() -> bool:
    if os.environ.get("QLLM_TPU_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def qmatmul(
    x: jax.Array, qt: QuantizedTensor, bias: Optional[jax.Array] = None
) -> jax.Array:
    """Quantized matmul with automatic backend selection.

    A 3-D qweight is an L=1 serving stack (models.stacked
    prepare_lm_head): it routes through the stacked Pallas kernel with
    layer=0 — the planar fused-correction family streams ~15% faster
    than the 2-D v3 path on 7B-class shapes. Its CPU/ineligible
    fallback unstacks internally."""
    if qt.qweight.ndim == 3:
        from .pallas_qmm import qmatmul_pallas_stacked

        y = qmatmul_pallas_stacked(x, qt, jnp.int32(0))
        if bias is not None:
            y = y + bias
        return y
    if _use_pallas():
        try:
            from .pallas_qmm import qmatmul_pallas
        except (ImportError, NotImplementedError):
            return qmatmul_ref(x, qt, bias)
        y = qmatmul_pallas(_apply_perm(x, qt), qt)
        if bias is not None:
            y = y + bias
        return y
    return qmatmul_ref(x, qt, bias)
