"""Offline proxy-Hessian pipeline: collect → merge → invert, with
on-disk artifacts and stage resume.

TPU-native rebuild of the reference's three-stage VPTQ Hessian tooling
(qllm/quantization/vptq/qllm_hessian.py, merge_hessian.py,
inv_hessian.py): long-context calibration sequences are pushed through
the model block by block; per shared-input linear the pipeline
accumulates ``H = XᵀX`` and the activation mean ``mu`` (the QuIP#-style
proxy Hessian), stores them **lower-triangle packed** (``flatH``,
qllm_hessian.py:100-103 ``sym_to_flat``), supports merging partial
collections from independent sample groups (merge_hessian.py:32-52:
flatH averaged over groups, mu count-weighted), and produces the
permuted damped upper-Cholesky inverse consumed by VQ solvers
(inv_hessian.py:43-86). Every stage writes a ``done.txt`` marker and
skips finished work on re-entry (qllm_hessian.py:247-249, 334-336;
quant_vptq.py:112-120) — crash resume is idempotent-cache based, like
everything else in this framework.

Where the reference hand-rolls multi-GPU queues + an accumulator thread
(qllm_hessian.py:127-204), here the per-chunk accumulation is a jitted
fp32 XᵀX that shards over a ``dp`` mesh with one ``psum``
(quant/hessian.py) — the artifacts and their math are identical.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "sym_to_flat",
    "flat_to_sym",
    "collect_proxy_hessians",
    "merge_hessians",
    "invert_hessians",
    "load_inv_hessian",
    "load_proxy_hessian",
]


def sym_to_flat(A: np.ndarray) -> np.ndarray:
    """Lower-triangle pack (reference qllm_hessian.py:100-103)."""
    N = A.shape[-1]
    idx = np.tril_indices(N)
    return np.ascontiguousarray(A[idx])


def flat_to_sym(V: np.ndarray, N: int) -> np.ndarray:
    """Inverse of sym_to_flat (reference qllm_hessian.py:92-97)."""
    A = np.zeros((N, N), dtype=V.dtype)
    idx = np.tril_indices(N)
    A[idx] = V
    A[(idx[1], idx[0])] = V
    return A


def _fname(layer: int, name: str) -> str:
    return f"model.layers.{layer}.{name}".replace("/", "_") + ".npz"


def _done(path: Path) -> Path:
    return path / "done.txt"


def collect_proxy_hessians(
    params: Dict[str, Any],
    model_cfg,
    tokens: jax.Array,  # [nsamples, ctx]
    out_dir: str,
    chunk: int = 2,
    progress: bool = True,
) -> str:
    """Stage 1: per-(layer, shared-input linear) H/mu/ct artifacts.

    Saves ``flatH = sym_to_flat(XᵀX / ct)``, ``mu = mean(x)``, ``n``,
    ``ct`` per linear — the exact payload merge/invert consume
    (qllm_hessian.py:172-204's accumulate + save). Activations are
    propagated through the ORIGINAL float blocks (proxy Hessians are
    collected pre-quantization, unlike the in-loop GPTQ collection).
    Resumable: finished layers are recorded in done.txt.
    """
    from .frame import embed_inputs

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    done_path = _done(out)
    finished = set(
        done_path.read_text().split() if done_path.exists() else []
    )

    h, cos, sin, mask = embed_inputs(params, model_cfg, tokens)
    layers = params["layers"]
    for i, lp in enumerate(layers):
        # the NEXT block needs this block's outputs even when cached —
        # run_block is cheap relative to Hessian accumulation
        if str(i) in finished:
            from .frame import run_block

            h = run_block(lp, model_cfg, h, cos, sin, mask)
            if progress:
                print(f"[hessian] layer {i} done (resume)", flush=True)
            continue
        B = h.shape[0]
        accs: Dict[str, Dict[str, Any]] = {}
        for s in range(0, B, chunk):
            e = min(s + chunk, B)
            acts = _intermediates(lp, model_cfg, h[s:e], cos[s:e], sin[s:e], mask[s:e])
            for name, x in acts.items():
                x2 = np.asarray(x, dtype=np.float64).reshape(-1, x.shape[-1])
                a = accs.setdefault(
                    name,
                    {
                        "H": np.zeros((x2.shape[1], x2.shape[1]), np.float64),
                        "mu": np.zeros((x2.shape[1],), np.float64),
                        "ct": 0,
                    },
                )
                a["H"] += x2.T @ x2
                a["mu"] += x2.sum(axis=0)
                a["ct"] += x2.shape[0]
        for name, a in accs.items():
            ct = max(a["ct"], 1)
            np.savez(
                out / _fname(i, name),
                flatH=sym_to_flat((a["H"] / ct).astype(np.float32)),
                mu=(a["mu"] / ct).astype(np.float32),
                n=np.int64(a["H"].shape[0]),
                ct=np.int64(a["ct"]),
            )
        from .frame import run_block

        h = run_block(lp, model_cfg, h, cos, sin, mask)
        finished.add(str(i))
        done_path.write_text(" ".join(sorted(finished, key=int)))
        if progress:
            print(
                f"[hessian] layer {i + 1}/{len(layers)}: "
                f"{sorted(accs)} saved",
                flush=True,
            )
    return str(out)


def _intermediates(lp, cfg, h, cos, sin, mask):
    from ..models.llama import layer_intermediates
    from .hessian import _share_key

    acts = layer_intermediates(lp, cfg, h, cos, sin, mask)
    return {
        k: v
        for k, v in acts.items()
        if _share_key(k, acts) == k and k != "experts_input"
    }


def merge_hessians(
    group_dirs: List[str], out_dir: str, progress: bool = True
) -> str:
    """Stage 2: merge partial collections from independent sample
    groups — flatH averaged over groups, mu count-weighted
    (merge_hessian.py:32-52)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    done_path = _done(out)
    if done_path.exists():
        return str(out)
    entries = [
        f for f in os.listdir(group_dirs[0]) if f.endswith(".npz")
    ]
    for entry in entries:
        total_flatH = None
        total_mu = None
        total_ct = 0
        n = None
        for gd in group_dirs:
            with np.load(Path(gd) / entry) as data:
                if total_flatH is None:
                    total_flatH = np.zeros_like(data["flatH"])
                    total_mu = np.zeros_like(data["mu"])
                total_flatH += data["flatH"]
                total_mu += data["mu"] * data["ct"]
                total_ct += int(data["ct"])
                n = int(data["n"])
        mu = total_mu / total_ct if total_ct > 0 else total_mu
        np.savez(
            out / entry,
            flatH=total_flatH / len(group_dirs),
            mu=mu.astype(np.float32),
            n=np.int64(n),
            ct=np.int64(total_ct),
        )
        if progress:
            print(f"[hessian] merged {entry} over {len(group_dirs)} groups")
    done_path.write_text("merged")
    return str(out)


def invert_hessians(
    in_dir: str,
    out_dir: str,
    percdamp: float = 0.01,
    enable_perm: bool = True,
    progress: bool = True,
) -> str:
    """Stage 3: permuted damped Cholesky inverse (inv_hessian.py:43-86).

    Per artifact: H = flat_to_sym + mu⊗mu (basic_preprocess
    inv_hessian.py:32-35), H /= mean(diag) then += 1e-2·I (regularize_H
    :25-30), dead columns get unit diagonal (:57-58), rows/cols permuted
    by descending diag (:60-63), damped by percdamp·mean(diag) (:66-68),
    then upper-Cholesky of the Cholesky inverse (:70-74). Saves
    {invH, perm, zero_idx}.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    done_path = _done(out)
    if done_path.exists():
        return str(out)
    for entry in sorted(os.listdir(in_dir)):
        if not entry.endswith(".npz"):
            continue
        with np.load(Path(in_dir) / entry) as data:
            n = int(data["n"])
            H = flat_to_sym(np.asarray(data["flatH"], np.float64), n)
            mu = np.asarray(data["mu"], np.float64)
        H += mu[None, :] * mu[:, None]
        H /= np.diag(H).mean()
        H[np.arange(n), np.arange(n)] += 1e-2
        zero_idx = np.diag(H) == 0
        H[zero_idx, zero_idx] = 1.0
        perm = np.argsort(-np.diag(H), kind="stable")
        if enable_perm:
            H = H[perm][:, perm]
        damp = percdamp * np.diag(H).mean()
        H[np.arange(n), np.arange(n)] += damp
        # chol -> chol-inverse -> upper chol, on device (jnp) — the
        # sequence the reference runs with torch.linalg (:70-74)
        L = np.asarray(jax.scipy.linalg.cholesky(jnp.asarray(H), lower=True))
        Hinv = np.asarray(
            jax.scipy.linalg.cho_solve((jnp.asarray(L), True), jnp.eye(n))
        )
        invH = np.asarray(
            jax.scipy.linalg.cholesky(jnp.asarray(Hinv), lower=False)
        )
        if not enable_perm:
            perm = np.arange(n)
        np.savez(
            out / entry,
            invH=invH.astype(np.float32),
            perm=perm.astype(np.int64),
            zero_idx=zero_idx,
        )
        if progress:
            print(f"[hessian] inverted {entry}")
    done_path.write_text("inverted")
    return str(out)


def load_proxy_hessian(dir_path: str, layer: int, name: str) -> np.ndarray:
    """Dense H (+ mu⊗mu) for (layer, linear) from stage-1/2 artifacts."""
    with np.load(Path(dir_path) / _fname(layer, name)) as data:
        H = flat_to_sym(np.asarray(data["flatH"], np.float64), int(data["n"]))
        mu = np.asarray(data["mu"], np.float64)
    return (H + mu[None, :] * mu[:, None]).astype(np.float32)


def load_inv_hessian(dir_path: str, layer: int, name: str):
    """(invH, perm, zero_idx) from stage-3 artifacts."""
    with np.load(Path(dir_path) / _fname(layer, name)) as data:
        return (
            np.asarray(data["invH"]),
            np.asarray(data["perm"]),
            np.asarray(data["zero_idx"]),
        )
