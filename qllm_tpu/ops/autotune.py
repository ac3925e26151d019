"""One-shot cached on-device block-size autotuner for the qmm kernels.

The TPU answer to the reference's Triton autotuner
(qllm/modeling/q_layers/custom_autotune.py: per-shape config sweep with
nearest-power-of-two bucketing and a persistent in-process cache): for
each (kind, K, N, bits, g, M-regime, device) the tuner times the REAL
stacked kernel over a small (bn, bk) candidate grid and persists the
winner to a JSON file next to the compile cache, so the sweep runs once
per machine, ever. Enabled with ``QLLM_TPU_AUTOTUNE=1`` (compiling a
handful of kernel variants costs minutes over a tunnel, so it is
opt-in); without it, lookups return cached winners when present and the
static heuristics otherwise. Env overrides (QLLM_TPU_QMM_BN/BK) always
win.

Timing caveat (NOTES.md): ``block_until_ready`` does not reliably block
on remote backends — timings force a device->host fetch and subtract a
measured RTT baseline, taking the median of repeats.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional, Tuple

import numpy as np

__all__ = [
    "lookup",
    "tune_stacked",
    "tune_for_tp_params",
    "cache_path",
    "clear_cache",
    "padded_width_hint",
]

_MEM: Dict[str, Tuple[int, int]] = {}
_LOADED = False
_SHIPPED: Optional[Dict[str, Tuple[int, int]]] = None


def _shipped() -> Dict[str, Tuple[int, int]]:
    """Pre-tuned (bn, bk) tables shipped with the package, keyed by
    device kind — sweep results for the common serving shapes measured
    once on real hardware (tools/sweep output), so serving gets tuned
    block sizes without ever running the sweep. The on-disk user cache
    and env overrides both take precedence."""
    global _SHIPPED
    if _SHIPPED is not None:
        return _SHIPPED
    _SHIPPED = {}
    try:
        import jax

        dev = jax.devices()[0].device_kind.replace(" ", "_")
        path = os.path.join(
            os.path.dirname(__file__), "tuned_defaults.json"
        )
        with open(path) as f:
            table = json.load(f).get(dev, {})
        _SHIPPED = {k: tuple(v) for k, v in table.items()}
    except Exception:
        pass
    return _SHIPPED


def cache_path() -> str:
    d = os.environ.get(
        "QLLM_TPU_CACHE", os.path.expanduser("~/.cache/qllm_tpu")
    )
    import jax

    dev = jax.devices()[0].device_kind.replace(" ", "_")
    return os.path.join(d, f"qmm_tune_{dev}.json")


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    try:
        with open(cache_path()) as f:
            for k, v in json.load(f).items():
                _MEM[k] = tuple(v)
    except Exception:
        pass


def _save() -> None:
    path = cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({k: list(v) for k, v in _MEM.items()}, f, indent=1)
    os.replace(tmp, path)


def _m_regime(M: int) -> str:
    # long-context prefill gets its own bucket: the best (bn, bk) at
    # M=2048 can differ from M=512's (compute-vs-VMEM balance shifts);
    # lookup falls back prefill_long -> prefill on a miss
    if M <= 32:
        return "decode"
    return "prefill" if M < 1024 else "prefill_long"


def _key(kind: str, K: int, N: int, bits: int, g: int, M: int) -> str:
    return f"{kind}:{K}x{N}:w{bits}g{g}:{_m_regime(M)}"


def clear_cache() -> None:
    _MEM.clear()
    try:
        os.remove(cache_path())
    except OSError:
        pass


def lookup(
    kind: str, K: int, N: int, bits: int, g: int, M: int
) -> Tuple[int, int]:
    """(bn, bk) for the shape, or (0, 0) = use the static heuristics.

    Env overrides disable the tuner (explicit user choice wins); with
    QLLM_TPU_AUTOTUNE=1 a cache miss triggers a one-shot sweep."""
    if os.environ.get("QLLM_TPU_QMM_BN") or os.environ.get("QLLM_TPU_QMM_BK"):
        return (0, 0)
    _load()
    key = _key(kind, K, N, bits, g, M)
    hit = _MEM.get(key)
    if hit is not None:
        return hit
    hit = _shipped().get(key)
    if hit is not None:
        return hit
    if key.endswith(":prefill_long"):
        # untuned long-context shape: the M=512-tuned prefill pick
        # beats the static heuristics
        hit = _MEM.get(key[: -len("_long")]) or _shipped().get(
            key[: -len("_long")]
        )
        if hit is not None:
            return hit
    if os.environ.get("QLLM_TPU_AUTOTUNE") != "1":
        return (0, 0)
    import jax

    try:
        from jax._src import core as _core

        if not _core.trace_state_clean():
            # called from inside a jit trace — cannot launch the sweep
            # here; pre-tune eagerly via tune_for_stacked_params
            return (0, 0)
    except Exception:
        return (0, 0)
    if jax.default_backend() == "cpu":
        return (0, 0)
    if kind not in ("stacked", "stacked_v3"):
        return (0, 0)
    # "stacked" = planar family (single-chip serving layout);
    # "stacked_v3" = packed v3/v4 family (TP shards can't planarize)
    best = tune_stacked(K, N, bits, g, M, planar=kind == "stacked")
    _MEM[key] = best
    _save()
    return best


def padded_width_hint(K: int, N: int, bits: int, g: int) -> int:
    """Evidence-driven lane padding: the width the stacked buffers should
    be padded to, beyond base lane alignment.

    Some shapes stream measurably faster at a WIDER padded width because
    it admits a larger lane block (swept on hardware: llama-7B gateup
    22016 -> 22528 admits bn=1024, +3.3% wall time despite +2.3% bytes).
    Padding costs real HBM bytes, so it is only applied when the tuned
    table (shipped or user cache) holds a winner for the padded shape —
    never speculatively. Returns N itself when no tuned wider shape
    exists. QLLM_TPU_WIDE_PAD=0 disables."""
    if os.environ.get("QLLM_TPU_WIDE_PAD", "1") == "0":
        return N
    _load()
    for q in (1024, 2048):
        cand = ((N + q - 1) // q) * q
        if cand == N:
            continue
        key = _key("stacked", K, cand, bits, g, 1)  # decode regime
        if key in _MEM or key in _shipped():
            return cand
    return N


def tune_for_stacked_params(params, Ms=(8,)) -> None:
    """Eagerly tune every distinct quantized shape in a stacked params
    pytree (call BEFORE jitting the decode loop — lookups from inside a
    trace can only read the cache)."""
    from ..quant.qtensor import QuantizedTensor

    seen = set()
    leaves = list(params.get("layers", {}).values()) + [
        params.get("lm_head")
    ]
    for leaf in leaves:
        if not isinstance(leaf, QuantizedTensor):
            continue
        K = leaf.in_features
        N = leaf.qweight.shape[-1]
        g = K if leaf.group_size == -1 else leaf.group_size
        kind = "stacked" if getattr(leaf, "planar", False) else "stacked_v3"
        for M in Ms:
            key = (kind, K, N, leaf.bits, g, _m_regime(M))
            if key in seen:
                continue
            seen.add(key)
            lookup(kind, K, N, leaf.bits, g, M)


def tune_for_tp_params(params, tp: int, Ms=(8,)) -> None:
    """Eagerly tune the LOCAL shard shapes a tp-way shard_map serving
    path will hand the kernels (VERDICT r2: tuned_defaults covered only
    full-K single-chip shapes; under tp the kernels see K/tp or N/tp and
    `lookup` fell back to heuristics on a real pod).

    ``params`` is the prepare_tp_params output (globally-shaped [L]
    stacks). Column-parallel tensors shard out-features (local N =
    N_buf/tp); row-parallel shard in-features (local K = K/tp). Call
    BEFORE jitting the decode loop, on ONE device — the kernels run on
    local shapes identically single-chip."""
    from ..quant.qtensor import QuantizedTensor

    col = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
    row = ("o_proj", "down_proj")
    seen = set()

    def tune_shape(K, N, bits, g, kind_note):
        for M in Ms:
            key = (K, N, bits, g, _m_regime(M))
            if key in seen:
                continue
            seen.add(key)
            # TP stacks are NON-planar (row sharding splits the planar
            # word) — tune the v3/v4 family the shards actually run
            lookup("stacked_v3", K, N, bits, g, M)

    layers = params.get("layers", {})
    items = list(layers.items()) if hasattr(layers, "items") else []
    for name, leaf in items:
        if not isinstance(leaf, QuantizedTensor):
            continue
        g = (
            leaf.in_features
            if leaf.group_size == -1
            else leaf.group_size
        )
        N_buf = leaf.qweight.shape[-1]
        if name in col:
            if N_buf % tp:
                continue
            tune_shape(leaf.in_features, N_buf // tp, leaf.bits, g, name)
        elif name in row:
            if leaf.in_features % tp:
                continue
            tune_shape(leaf.in_features // tp, N_buf, leaf.bits, g, name)
    lm = params.get("lm_head")
    if isinstance(lm, QuantizedTensor):
        g = lm.in_features if lm.group_size == -1 else lm.group_size
        N_buf = lm.qweight.shape[-1]
        if N_buf % tp == 0:
            tune_shape(lm.in_features, N_buf // tp, lm.bits, g, "lm_head")


def _time_once(fn, fetch) -> float:
    t0 = time.time()
    fetch(fn())
    return time.time() - t0


def tune_stacked(
    K: int,
    N: int,
    bits: int,
    g: int,
    M: int,
    L: int = 4,
    repeats: int = 5,
    planar: Optional[bool] = None,
) -> Tuple[int, int]:
    """Sweep (bn, bk) candidates on the real stacked kernel for a
    synthetic [L]-stack of this shape; returns the winner (bn, bk).
    ``planar``: force the kernel family (None = planar when the
    geometry admits it — the single-chip serving layout; False = the
    packed v3/v4 layout TP shards use)."""
    import jax
    import jax.numpy as jnp

    from ..quant.qtensor import quantize_tensor
    from . import pallas_qmm as pq

    g_eff = K if g == -1 else g
    rng = np.random.default_rng(0)
    qt = quantize_tensor(
        jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
        bits=bits,
        group_size=g,
    )
    import jax.tree_util as tu

    stacked = tu.tree_map(lambda a: jnp.stack([a] * L), qt)
    import dataclasses

    from ..quant.qtensor import planarize_packed

    if planar is None or planar:
        planar = bits == 4 and (
            pq.planar_bk(K, g_eff) is not None
            or pq.planar_full_ok(K, g_eff)
        )
    zs = stacked.zeros * stacked.scales
    if planar:
        pqw = jnp.stack(
            [planarize_packed(stacked.qweight[i], K) for i in range(L)]
        )
        # mirror the serving layout: bf16 scale storage (also required
        # by the fused kernel's TPU compile — see qmatmul_pallas_stacked)
        stacked = dataclasses.replace(
            stacked,
            qweight=pqw,
            scales=stacked.scales.astype(jnp.bfloat16),
            zeros=zs.astype(jnp.bfloat16),
            planar=True,
            zeros_prefolded=True,
        )
    else:
        stacked = dataclasses.replace(stacked, zeros=zs, zeros_prefolded=True)
    x = jnp.asarray(rng.normal(size=(max(8, M), K)).astype(np.float32))

    # A single kernel runs tens of µs — far below tunnel jitter, and the
    # tunnel RTT is NOT additive (device work overlaps the round-trip
    # window), so "fetch time minus RTT" reads ~0 for anything shorter
    # than the RTT. Instead: chain n kernel invocations inside ONE jit
    # with n as a TRACED bound (one compile per candidate), and take the
    # slope between a short and a long run — constant overhead cancels
    # exactly, leaving pure per-invocation device time.
    n_lo = int(os.environ.get("QLLM_TPU_AUTOTUNE_REPS", "64"))
    # size the long run so the delta is several RTTs of device time even
    # if the kernel hits the practical streaming ceiling (~500 GB/s) —
    # or, at prefill, the MXU peak (compute-bound regime; the bytes-only
    # estimate over-sized prefill sweeps ~50x)
    bytes_per = K * N * bits / 8
    est = max(bytes_per / 500e9, 2.0 * M * K * N / 150e12)
    n_hi = n_lo + max(256, int(0.4 / est))

    def make_loop(bn, bk):
        # the weight stack rides as jit ARGUMENTS, not closure consts:
        # closed-over arrays lower to HLO literals, and a 2048x32768 L=8
        # stack made the remote_compile request body exceed the proxy's
        # limit (HTTP 413) — the failure that killed the r4 lm_head sweep
        def run(x0, n, qw, sc, zr):
            def one(i, acc):
                y = pq._qmm_2d_stacked(
                    x0 + acc[:, :1],  # serial dependency across reps
                    (i % L).astype(jnp.int32),
                    qw,
                    sc,
                    zr,
                    bits,
                    g,
                    K,
                    N,
                    planar=stacked.planar,
                    prefolded=True,
                    fuse_corr=stacked.planar,
                    bn_opt=bn,
                    bk_opt=bk,
                )
                return acc + 1e-9 * jnp.sum(y)[None, None]

            return jax.lax.fori_loop(
                0, n, one, jnp.zeros((1, 1), jnp.float32)
            )

        jitted = jax.jit(run)
        return lambda x0, n: jitted(
            x0, n, stacked.qweight, stacked.scales, stacked.zeros
        )

    bn_cands = [b for b in (256, 512, 1024) if N % b == 0] or [0]
    bk_cands = [b for b in (1024, 2048, 4096) if b <= K] or [0]
    results = {}
    for bn in bn_cands:
        for bk in bk_cands:
            try:
                fn = make_loop(bn, bk)
                fetch = lambda y: float(jnp.sum(y))  # noqa: E731
                lo = jnp.int32(n_lo)
                hi = jnp.int32(n_hi)
                fetch(fn(x, hi))  # compile + warm
                per_rep = []
                for _ in range(repeats):
                    t_lo = _time_once(lambda: fn(x, lo), fetch)
                    t_hi = _time_once(lambda: fn(x, hi), fetch)
                    per_rep.append((t_hi - t_lo) / (n_hi - n_lo))
                per_rep.sort()
                results[(bn, bk)] = max(per_rep[len(per_rep) // 2], 1e-9)
                if os.environ.get("QLLM_TPU_AUTOTUNE_VERBOSE"):
                    print(
                        f"[autotune]   ({bn}, {bk}): "
                        f"{bytes_per / results[(bn, bk)] / 1e9:.0f} GB/s",
                        flush=True,
                    )
            except Exception as e:
                if os.environ.get("QLLM_TPU_AUTOTUNE_VERBOSE"):
                    print(
                        f"[autotune]   ({bn}, {bk}): FAIL "
                        f"{type(e).__name__}: {str(e)[:200]}",
                        flush=True,
                    )
                continue
    if not results:
        return (0, 0)
    best = min(results, key=results.get)
    gbps = bytes_per / results[best] / 1e9
    print(
        f"[autotune] {K}x{N} w{bits}g{g} {_m_regime(M)}: best (bn, bk) = "
        f"{best} ~{gbps:.0f} GB/s over {len(results)} candidates",
        flush=True,
    )
    return best
