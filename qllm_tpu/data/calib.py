"""Calibration datasets (reference utils/datautils.py + auto_datasets/).

Loaders for wikitext2 / ptb(-new) / c4(-new) / pileval with the
reference's exact sampling semantics (seeded random seqlen windows,
datautils.py:9-150; pileval concat-and-block :175-212) and the tokenized
-dataloader disk cache keyed by (tokenizer, dataset, nsamples, seqlen,
seed) (auto_datasets/__init__.py:16-31).

This environment has no network egress and may lack the ``datasets``
package, so three sources are supported, in order:
  1. HF ``datasets`` (when installed + cached locally)
  2. ``QLLM_TPU_DATA_DIR/<name>.txt`` raw-text files
  3. ``synthetic`` — seeded random token ids (smoke tests only; loudly
     labeled)
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import List, Optional, Tuple

import numpy as np

from ..utils.logger import get_logger

logger = get_logger()

__all__ = ["get_loaders", "get_sample_datas_for_quantization"]

_CACHE_DIR = os.environ.get(
    "QLLM_TPU_CACHE", os.path.expanduser("~/.cache/qllm_tpu")
)


def _dataset_text(name: str, split: str) -> Optional[List[str]]:
    """Fetch raw text via HF datasets or a local text file; None if
    unavailable."""
    try:
        from datasets import load_dataset  # type: ignore

        if name == "wikitext2":
            d = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
            return ["\n\n".join(d["text"])]
        if name == "ptb":
            d = load_dataset("ptb_text_only", "penn_treebank", split=split)
            return ["\n\n".join(d["sentence"])]
        if name == "ptb-new":
            d = load_dataset("ptb_text_only", "penn_treebank", split="test")
            return [" ".join(d["sentence"])]
        if name in ("c4", "c4-new"):
            d = load_dataset(
                "allenai/c4",
                data_files={"train": "en/c4-train.00000-of-01024.json.gz"},
                split="train",
            )
            return list(d["text"])
        if name == "pileval":
            d = load_dataset(
                "mit-han-lab/pile-val-backup", split="validation"
            )
            return list(d["text"])
    except Exception as e:  # pragma: no cover - env dependent
        logger.debug(f"datasets unavailable for {name}: {e}")
    data_dir = os.environ.get("QLLM_TPU_DATA_DIR")
    if data_dir:
        p = os.path.join(data_dir, f"{name}.txt")
        if os.path.exists(p):
            with open(p, encoding="utf-8") as f:
                return [f.read()]
    return None


def _random_windows(
    ids: np.ndarray, nsamples: int, seqlen: int, seed: int
) -> np.ndarray:
    """Reference sampling: seeded random windows of seqlen tokens
    (datautils.py get_wikitext2 :20-32)."""
    rng = np.random.RandomState(seed)
    out = np.empty((nsamples, seqlen), np.int32)
    for i in range(nsamples):
        start = rng.randint(0, max(1, len(ids) - seqlen - 1))
        out[i] = ids[start : start + seqlen]
    return out


def _per_document_windows(
    texts: List[str], tokenizer, nsamples: int, seqlen: int, seed: int
) -> np.ndarray:
    """Reference C4 sampling (datautils.py:82-150): per sample, pick a
    random document, re-draw while it tokenizes shorter than seqlen,
    then take a random seqlen window inside it. Uses random.Random to
    match the reference's ``random.seed(seed)`` stream semantics."""
    import random as _random

    rng = _random.Random(seed)
    out = np.empty((nsamples, seqlen), np.int32)
    tok_cache: dict = {}
    for s in range(nsamples):
        for _ in range(10000):
            i = rng.randint(0, len(texts) - 1)
            ids = tok_cache.get(i)
            if ids is None:
                ids = tokenizer(texts[i], return_tensors="np").input_ids[0]
                tok_cache[i] = ids
            if len(ids) >= seqlen + 1:
                break
        else:
            raise ValueError(
                f"no document tokenizes to >= {seqlen + 1} tokens"
            )
        j = rng.randint(0, len(ids) - seqlen - 1)
        out[s] = ids[j : j + seqlen]
    return out


def _concat_blocks(
    texts: List[str], tokenizer, nsamples: int, seqlen: int
) -> np.ndarray:
    """pileval-style: tokenize samples, concat, cut into blocks
    (datautils.py get_calib_dataset :175-212)."""
    chunks = []
    total = 0
    for t in texts:
        t = t.strip()
        if not t:
            continue
        ids = tokenizer(t, return_tensors="np").input_ids[0]
        if len(ids) == 0:
            continue
        chunks.append(ids)
        total += len(ids)
        if total >= nsamples * seqlen:
            break
    cat = np.concatenate(chunks)
    n_blocks = min(nsamples, len(cat) // seqlen)
    return cat[: n_blocks * seqlen].reshape(n_blocks, seqlen).astype(np.int32)


def get_loaders(
    name: str,
    tokenizer=None,
    nsamples: int = 128,
    seed: int = 0,
    seqlen: int = 2048,
    allow_synthetic: bool = False,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """-> (train_tokens [nsamples, seqlen] int32, test_tokens flat or None).

    Mirrors reference get_loaders (datautils.py:153-172). A missing
    tokenizer for a REAL dataset is a hard error unless
    ``allow_synthetic`` (or name == "synthetic") — an accuracy run must
    never silently measure random tokens.
    """
    if name == "synthetic" or tokenizer is None:
        if name != "synthetic":
            if not allow_synthetic:
                raise RuntimeError(
                    f"dataset '{name}' requested but no tokenizer is "
                    "available — refusing to silently substitute "
                    "synthetic tokens in an accuracy context. Pass "
                    "--allow_synthetic (or dataset=synthetic) for "
                    "smoke-test runs."
                )
            logger.warning(
                f"dataset '{name}': no tokenizer given — falling back to "
                "SYNTHETIC calibration tokens (smoke-test quality only)"
            )
        rng = np.random.RandomState(seed)
        vocab = 32000
        train = rng.randint(0, vocab, size=(nsamples, seqlen)).astype(np.int32)
        test = rng.randint(0, vocab, size=(seqlen * 16,)).astype(np.int32)
        return train, test

    texts = _dataset_text(name, "train")
    if texts is None:
        raise FileNotFoundError(
            f"dataset '{name}' unavailable: install/cache HF datasets or "
            f"put {name}.txt under $QLLM_TPU_DATA_DIR (or use 'synthetic')"
        )
    if name == "pileval":
        train = _concat_blocks(texts, tokenizer, nsamples, seqlen)
        test = None
    elif name in ("c4", "c4-new"):
        # reference C4 sampling draws a random window from a random
        # DOCUMENT, re-drawing while the doc is shorter than seqlen
        # (datautils.py get_c4/get_c4_new :82-150) — concatenating the
        # shard and windowing across document boundaries drifts the
        # calibration distribution
        train = _per_document_windows(texts, tokenizer, nsamples, seqlen, seed)
        test = None
    else:
        ids = tokenizer("\n\n".join(texts), return_tensors="np").input_ids[0]
        train = _random_windows(ids, nsamples, seqlen, seed)
        test_texts = _dataset_text(name, "test")
        test = (
            tokenizer("\n\n".join(test_texts), return_tensors="np").input_ids[0]
            if test_texts
            else None
        )
    return train, test


def get_sample_datas_for_quantization(
    args_or_name,
    tokenizer=None,
    nsamples: int = 128,
    seqlen: int = 2048,
    seed: int = 0,
):
    """Cached entry point (reference auto_datasets/__init__.py:16-31)."""
    name = getattr(args_or_name, "dataset", args_or_name)
    nsamples = getattr(args_or_name, "nsamples", nsamples)
    seed = getattr(args_or_name, "seed", seed)
    allow_synthetic = getattr(args_or_name, "allow_synthetic", False)
    tok_id = getattr(tokenizer, "name_or_path", "none")
    key = hashlib.md5(
        f"{tok_id}-{name}-{nsamples}-{seqlen}-{seed}".encode()
    ).hexdigest()[:16]
    cache = os.path.join(_CACHE_DIR, f"calib_{name}_{key}.pkl")
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)
    data = get_loaders(
        name, tokenizer, nsamples, seed, seqlen,
        allow_synthetic=allow_synthetic,
    )
    os.makedirs(_CACHE_DIR, exist_ok=True)
    with open(cache, "wb") as f:
        pickle.dump(data, f)
    return data
