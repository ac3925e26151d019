"""Compute ops: the quantized-matmul entry point and its backends.

``qmatmul(x, qt)`` is the single op every model layer calls (the analog
of the reference's five QuantLinear.forward paths, e.g.
quant_linear_gptq.py:70-85). Backend selection is automatic:
  * Pallas fused unpack+dequant+MXU matmul on TPU (pallas_qmm.py)
  * plain-XLA dequant-then-dot everywhere else (ref_matmul.py) — also
    the numerics oracle for kernel tests.
"""

from .ref_matmul import qmatmul_ref, qmatmul
from .kv_cache import QuantizedKVCache

__all__ = ["qmatmul", "qmatmul_ref", "QuantizedKVCache"]
