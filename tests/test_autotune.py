"""Block-size autotuner: cache mechanics (device sweeps are TPU-only)."""

import json
import os

import numpy as np

import qllm_tpu.ops.autotune as at


def _reset(monkeypatch, tmp_path):
    monkeypatch.setenv("QLLM_TPU_CACHE", str(tmp_path))
    monkeypatch.delenv("QLLM_TPU_QMM_BN", raising=False)
    monkeypatch.delenv("QLLM_TPU_QMM_BK", raising=False)
    monkeypatch.delenv("QLLM_TPU_AUTOTUNE", raising=False)
    at._MEM.clear()
    at._LOADED = False


def test_lookup_defaults_without_cache(monkeypatch, tmp_path):
    _reset(monkeypatch, tmp_path)
    assert at.lookup("stacked", 4096, 4096, 4, 128, 8) == (0, 0)


def test_lookup_reads_persisted_cache(monkeypatch, tmp_path):
    _reset(monkeypatch, tmp_path)
    key = at._key("stacked", 4096, 11264, 4, 128, 8)
    os.makedirs(os.path.dirname(at.cache_path()), exist_ok=True)
    with open(at.cache_path(), "w") as f:
        json.dump({key: [1024, 4096]}, f)
    assert at.lookup("stacked", 4096, 11264, 4, 128, 8) == (1024, 4096)
    # M-regime bucketing: prefill is a distinct key
    assert at.lookup("stacked", 4096, 11264, 4, 128, 256) == (0, 0)


def test_env_override_wins(monkeypatch, tmp_path):
    _reset(monkeypatch, tmp_path)
    key = at._key("stacked", 4096, 11264, 4, 128, 8)
    os.makedirs(os.path.dirname(at.cache_path()), exist_ok=True)
    with open(at.cache_path(), "w") as f:
        json.dump({key: [1024, 4096]}, f)
    monkeypatch.setenv("QLLM_TPU_QMM_BN", "256")
    assert at.lookup("stacked", 4096, 11264, 4, 128, 8) == (0, 0)


def test_shipped_defaults_consulted_on_miss(monkeypatch, tmp_path):
    _reset(monkeypatch, tmp_path)
    key = at._key("stacked", 4096, 22016, 4, 128, 8)
    monkeypatch.setattr(at, "_SHIPPED", {key: (256, 2048)})
    assert at.lookup("stacked", 4096, 22016, 4, 128, 8) == (256, 2048)
    # different shape: falls through to heuristics
    assert at.lookup("stacked", 4096, 5120, 4, 128, 8) == (0, 0)


def test_user_cache_beats_shipped(monkeypatch, tmp_path):
    _reset(monkeypatch, tmp_path)
    key = at._key("stacked", 4096, 22016, 4, 128, 8)
    monkeypatch.setattr(at, "_SHIPPED", {key: (256, 2048)})
    os.makedirs(os.path.dirname(at.cache_path()), exist_ok=True)
    with open(at.cache_path(), "w") as f:
        json.dump({key: [512, 4096]}, f)
    assert at.lookup("stacked", 4096, 22016, 4, 128, 8) == (512, 4096)


def test_save_roundtrip(monkeypatch, tmp_path):
    _reset(monkeypatch, tmp_path)
    at._MEM[at._key("stacked", 128, 256, 4, 64, 8)] = (256, 1024)
    at._save()
    at._MEM.clear()
    at._LOADED = False
    assert at.lookup("stacked", 128, 256, 4, 64, 8) == (256, 1024)
