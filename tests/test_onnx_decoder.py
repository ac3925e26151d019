"""Full-model ONNX decoder export: structure + executed numeric parity.

The merged decoder (decoder_model_merged.onnx — the reference's
headline artifact, merge_encoder_decoder.py:325+) is parsed back from
its serialized bytes and EXECUTED with the pure-numpy evaluator
(export/onnx_exec.py), then compared against eval/numpy_ref.py — an
independent engine end to end, mirroring the reference's ORT-vs-torch
verification (utils/onnx/exporter.py:68-128).
"""

import jax
import numpy as np
import pytest

from qllm_tpu.eval.numpy_ref import np_forward_logits
from qllm_tpu.export.onnx_decoder import export_onnx_decoder
from qllm_tpu.export.onnx_exec import run_model
from qllm_tpu.export.onnx_proto import parse_model
from qllm_tpu.models.llama import TINY_LLAMA_TEST_CONFIG
from qllm_tpu.utils.testing import random_quantized_params

CFG = TINY_LLAMA_TEST_CONFIG


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    params = random_quantized_params(
        CFG, jax.random.PRNGKey(0), bits=4, group_size=32
    )
    out = tmp_path_factory.mktemp("onnx_export")
    paths = export_onnx_decoder(params, CFG, str(out))
    return params, paths


def _prefill_feeds(T=6, B=1, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, CFG.vocab_size, (B, T)).astype(np.int64)
    return {
        "input_ids": ids,
        "attention_mask": np.ones((B, T), np.int64),
        "position_ids": np.broadcast_to(np.arange(T), (B, T)).astype(
            np.int64
        ),
    }


def test_artifacts_written_and_parse(exported):
    _, paths = exported
    assert set(paths) == {
        "decoder_model.onnx",
        "decoder_with_past_model.onnx",
        "decoder_model_merged.onnx",
    }
    m = parse_model(open(paths["decoder_model_merged.onnx"], "rb").read())
    g = m["graph"]
    assert [n["op_type"] for n in g["nodes"]] == ["If"]
    in_names = [v["name"] for v in g["inputs"]]
    assert in_names[:3] == ["input_ids", "attention_mask", "position_ids"]
    assert "past_key_values.0.key" in in_names
    assert in_names[-1] == "use_cache_branch"
    out_names = [v["name"] for v in g["outputs"]]
    assert out_names[0] == "logits"
    assert f"present.{CFG.num_hidden_layers - 1}.value" in out_names
    # weight initializers deduplicated into the parent (merge
    # hoists both branches' identical tensors to ONE copy)
    assert any("q_proj.qweight" in k for k in g["initializers"])
    att = g["nodes"][0]["attributes"]
    for t in (att["then_branch"]["g"], att["else_branch"]["g"]):
        assert not any(
            "q_proj.qweight" in ti["name"]
            for ti in t["initializers"].values()
        )


def test_matmulnbits_nodes_cover_every_linear(exported):
    _, paths = exported
    m = parse_model(open(paths["decoder_model.onnx"], "rb").read())
    mm = [
        n
        for n in m["graph"]["nodes"]
        if n["op_type"] == "MatMulNBits"
    ]
    assert len(mm) == CFG.num_hidden_layers * 7  # qkv+o+gate+up+down
    for n in mm:
        assert n["domain"] == "com.microsoft"
        assert n["attributes"]["bits"]["i"] == 4
        assert n["attributes"]["block_size"]["i"] == 32


def test_merged_prefill_matches_numpy_ref(exported):
    params, paths = exported
    data = open(paths["decoder_model_merged.onnx"], "rb").read()
    feeds = _prefill_feeds()
    feeds["use_cache_branch"] = np.asarray([False])
    out = run_model(data, feeds)
    ref = np_forward_logits(params, CFG, feeds["input_ids"])
    scale = max(float(np.abs(ref).max()), 1e-6)
    err = float(np.abs(out["logits"] - ref).max()) / scale
    assert err < 1e-2, f"prefill rel err {err}"
    assert out["present.0.key"].shape == (
        1,
        CFG.num_key_value_heads,
        6,
        CFG.hd,
    )


def test_merged_decode_step_matches_numpy_ref(exported):
    params, paths = exported
    data = open(paths["decoder_model_merged.onnx"], "rb").read()
    T = 6
    feeds = _prefill_feeds(T)
    feeds["use_cache_branch"] = np.asarray([False])
    out = run_model(data, feeds)
    nxt = np.argmax(out["logits"][:, -1], -1).astype(np.int64)

    feeds2 = {
        "input_ids": nxt[:, None],
        "attention_mask": np.ones((1, T + 1), np.int64),
        "position_ids": np.full((1, 1), T, np.int64),
        "use_cache_branch": np.asarray([True]),
    }
    for i in range(CFG.num_hidden_layers):
        feeds2[f"past_key_values.{i}.key"] = out[f"present.{i}.key"]
        feeds2[f"past_key_values.{i}.value"] = out[f"present.{i}.value"]
    out2 = run_model(data, feeds2)

    full = np.concatenate(
        [_prefill_feeds(T)["input_ids"], nxt[:, None]], axis=1
    )
    ref = np_forward_logits(params, CFG, full)[:, -1:]
    scale = max(float(np.abs(ref).max()), 1e-6)
    err = float(np.abs(out2["logits"] - ref).max()) / scale
    assert err < 1e-2, f"decode rel err {err}"
    assert out2["present.0.key"].shape[2] == T + 1


def test_decode_greedy_continuation_consistent(exported):
    """4 greedy steps through the with-past branch match the numpy
    full-forward argmax trajectory."""
    params, paths = exported
    data = open(paths["decoder_model_merged.onnx"], "rb").read()
    T = 5
    feeds = _prefill_feeds(T, seed=3)
    ids = feeds["input_ids"]
    feeds["use_cache_branch"] = np.asarray([False])
    out = run_model(data, feeds)
    past = {
        k: v for k, v in out.items() if k.startswith("present.")
    }
    cur = np.argmax(out["logits"][:, -1], -1)
    onnx_tokens = [int(cur[0])]
    for step in range(3):
        S = T + step + 1
        feeds2 = {
            "input_ids": cur[:, None].astype(np.int64),
            "attention_mask": np.ones((1, S), np.int64),
            "position_ids": np.full((1, 1), S - 1, np.int64),
            "use_cache_branch": np.asarray([True]),
        }
        for k, v in past.items():
            feeds2[k.replace("present.", "past_key_values.")] = v
        out = run_model(data, feeds2)
        past = {
            k: v for k, v in out.items() if k.startswith("present.")
        }
        cur = np.argmax(out["logits"][:, -1], -1)
        onnx_tokens.append(int(cur[0]))

    ref_tokens = []
    seq = ids
    for _ in range(4):
        ref = np_forward_logits(params, CFG, seq)
        nxt = int(np.argmax(ref[0, -1]))
        ref_tokens.append(nxt)
        seq = np.concatenate([seq, [[nxt]]], axis=1)
    assert onnx_tokens == ref_tokens
