"""Quantization telemetry (reference utils/modelutils.py torch_snr_error
:71-118 and the Texttable per-layer reports, gptq.py:104-127)."""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["snr_error", "format_table", "quant_report"]


def snr_error(y_ref, y_quant, reduction: str = "mean") -> float:
    """Relative power of the quantization noise, matching the reference
    semantics (noise_power / signal_power, per-row then reduced)."""
    y_ref = np.asarray(y_ref, np.float32).reshape(np.asarray(y_ref).shape[0], -1)
    y_q = np.asarray(y_quant, np.float32).reshape(y_ref.shape)
    noise = ((y_ref - y_q) ** 2).sum(axis=1)
    signal = (y_ref**2).sum(axis=1) + 1e-20
    rel = noise / signal
    return float(rel.mean() if reduction == "mean" else rel.max())


def format_table(headers: Sequence[str], rows: List[Sequence]) -> str:
    widths = [
        max(len(str(h)), *(len(str(r[i])) for r in rows)) if rows else len(str(h))
        for i, h in enumerate(headers)
    ]
    line = "+".join("-" * (w + 2) for w in widths)
    out = [line]
    out.append(" | ".join(str(h).ljust(w) for h, w in zip(headers, widths)))
    out.append(line)
    for r in rows:
        out.append(" | ".join(str(c).ljust(w) for c, w in zip(r, widths)))
    out.append(line)
    return "\n".join(out)


def quant_report(observer: List[Tuple]) -> str:
    """Render GPTQQuantizer.observer entries
    (name, error, (bits, gs)[, snr_db]) — the reference's per-layer
    Texttable report incl. the output-SNR column (gptq.py:104-127)."""
    rows = []
    for entry in observer:
        name, err = entry[0], entry[1]
        used = entry[2] if len(entry) > 2 else ("-", "-")
        snr = entry[3] if len(entry) > 3 else None
        rows.append(
            [
                name,
                f"{err:.4g}",
                used[0],
                used[1],
                "-" if snr is None else f"{snr:.2f} dB",
            ]
        )
    return format_table(
        ["layer", "quant error", "bits", "groupsize", "out SNR"], rows
    )
