"""Calibration sampling semantics (reference utils/datautils.py)."""

import numpy as np

from qllm_tpu.data.calib import (
    _concat_blocks,
    _per_document_windows,
    _random_windows,
    get_loaders,
)


class _FakeTok:
    """Whitespace 'tokenizer': each word w<i> -> id i."""

    name_or_path = "fake"

    def __call__(self, text, return_tensors=None):
        ids = np.asarray(
            [[int(w[1:]) for w in text.split()]], dtype=np.int64
        )

        class R:
            input_ids = ids

        return R()


def _doc(ids):
    return " ".join(f"w{i}" for i in ids)


def test_per_document_windows_stays_inside_documents():
    """Reference C4 sampling (datautils.py:82-150): windows never cross
    document boundaries, short docs are re-drawn."""
    rng = np.random.default_rng(0)
    # doc d holds only ids in [d*1000, d*1000+len) -> window provenance
    # is checkable; doc 2 is too short to ever be sampled
    docs = [
        _doc(range(0, 40)),
        _doc(range(1000, 1050)),
        _doc(range(2000, 2004)),  # shorter than seqlen+1
        _doc(range(3000, 3032)),
    ]
    out = _per_document_windows(docs, _FakeTok(), nsamples=16, seqlen=16, seed=3)
    assert out.shape == (16, 16)
    for row in out:
        base = row[0] // 1000
        assert base != 2
        assert np.all(row // 1000 == base), "window crossed a document"
        assert np.array_equal(row, np.arange(row[0], row[0] + 16))


def test_random_windows_seeded():
    ids = np.arange(500)
    a = _random_windows(ids, 4, 32, seed=7)
    b = _random_windows(ids, 4, 32, seed=7)
    np.testing.assert_array_equal(a, b)
    c = _random_windows(ids, 4, 32, seed=8)
    assert not np.array_equal(a, c)


def test_concat_blocks_shapes():
    docs = [_doc(range(0, 50)), _doc(range(100, 150))]
    out = _concat_blocks(docs, _FakeTok(), nsamples=3, seqlen=16)
    assert out.shape[1] == 16 and 1 <= out.shape[0] <= 3


def test_get_loaders_local_text_dir(tmp_path, monkeypatch):
    """QLLM_TPU_DATA_DIR recipe: c4.txt lines act as documents."""
    p = tmp_path / "c4.txt"
    p.write_text(_doc(range(0, 200)))
    monkeypatch.setenv("QLLM_TPU_DATA_DIR", str(tmp_path))
    train, test = get_loaders("c4", _FakeTok(), nsamples=2, seqlen=8, seed=0)
    assert train.shape == (2, 8)


def test_get_loaders_synthetic_labeled():
    train, test = get_loaders("synthetic", None, nsamples=2, seqlen=8)
    assert train.shape == (2, 8) and test is not None
