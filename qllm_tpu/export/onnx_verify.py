"""Numeric verification of the exported ONNX decoder artifacts.

Mirrors the reference's export gate (utils/onnx/exporter.py:68-128:
run the exported model under another engine, compare logits < 1e-2):
the merged decoder bytes are executed by the pure-numpy evaluator
(export/onnx_exec.py) for a prefill and one decode step, and compared
against eval/numpy_ref.py — fully independent of JAX/XLA.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..eval.numpy_ref import np_forward_logits
from .onnx_exec import run_model

__all__ = ["verify_onnx_decoder"]

_RTOL = 1e-2  # reference parity gate, relative to logit scale


def verify_onnx_decoder(
    params,
    cfg,
    paths: Dict[str, str],
    prompt_len: int = 8,
    seed: int = 0,
) -> float:
    data = open(paths["decoder_model_merged.onnx"], "rb").read()
    rng = np.random.default_rng(seed)
    T = prompt_len
    ids = rng.integers(0, cfg.vocab_size, (1, T)).astype(np.int64)
    feeds = {
        "input_ids": ids,
        "attention_mask": np.ones((1, T), np.int64),
        "position_ids": np.arange(T, dtype=np.int64)[None],
        "use_cache_branch": np.asarray([False]),
    }
    out = run_model(data, feeds)
    ref = np_forward_logits(params, cfg, ids)
    scale = max(float(np.abs(ref).max()), 1e-6)
    err = float(np.abs(out["logits"] - ref).max()) / scale

    nxt = np.argmax(out["logits"][:, -1], -1).astype(np.int64)
    feeds2 = {
        "input_ids": nxt[:, None],
        "attention_mask": np.ones((1, T + 1), np.int64),
        "position_ids": np.full((1, 1), T, np.int64),
        "use_cache_branch": np.asarray([True]),
    }
    for i in range(len(params["layers"])):
        feeds2[f"past_key_values.{i}.key"] = out[f"present.{i}.key"]
        feeds2[f"past_key_values.{i}.value"] = out[f"present.{i}.value"]
    out2 = run_model(data, feeds2)
    full = np.concatenate([ids, nxt[:, None]], axis=1)
    ref2 = np_forward_logits(params, cfg, full)[:, -1:]
    scale2 = max(float(np.abs(ref2).max()), 1e-6)
    err = max(err, float(np.abs(out2["logits"] - ref2).max()) / scale2)
    if err > _RTOL:
        raise AssertionError(
            f"ONNX decoder verification failed: rel err {err:.4g} > {_RTOL}"
        )
    return err
