"""Continuous-batching serving engine over the quantized KV cache.

Green-field subsystem demanded by BASELINE.json's north star ("continuous
batching across hosts", INT8-KV decode) — the reference has no serving
runtime at all (its "serve" is an in-process chat loop,
SURVEY.md §1 note).

Design (slot-based, XLA-friendly):
  * a fixed pool of B slots shares one [L, B, H, S_max, D] int8 KV cache
    — static shapes, one compiled decode step reused forever.
  * admission: a new request is prefilled alone (bucketed prompt
    lengths to bound compile count) and its KV inserted into a free
    slot; its first generated token joins the next batched step.
  * every decode step advances ALL active slots with per-slot positions
    (the [B]-pos path of forward/QuantizedKVCache.update); finished
    slots are masked out host-side and immediately reusable.
  * across hosts this engine shards slots over the mesh 'dp' axis and
    weights/KV-heads over 'tp' (parallel/sharding.py) — the decode step
    is the same jitted function.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from functools import partial
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.generate import make_cache
from ..models.llama import ModelConfig, forward
from ..models.sampling import SamplingParams, sample_logits
from ..ops.kv_cache import QuantizedKVCache

__all__ = [
    "ServeConfig",
    "Request",
    "ContinuousBatchingEngine",
    "SamplingParams",
]


@dataclasses.dataclass
class ServeConfig:
    max_batch: int = 8
    max_seq: int = 2048
    quantized_kv: bool = True
    eos_token_id: Optional[int] = None
    prefill_buckets: tuple = (32, 64, 128, 256, 512, 1024)
    # >1: run this many decode steps per dispatch fully on-device
    # (eos-aware); admission happens between chunks. Amortizes host
    # round-trips — essential on high-dispatch-latency links.
    decode_chunk: int = 1
    # admission prefill is processed at most this many prompt tokens per
    # engine iteration, interleaved with decode steps — a long prompt no
    # longer stalls every active stream for its full prefill
    prefill_chunk: int = 256
    # engine-level PRNG seed for stochastic requests (per-request
    # sampling params live on Request.sampling)
    seed: int = 0
    # n-gram speculative decoding for all-greedy batches: each dispatch
    # drafts spec_gamma tokens from the slot's own token history and
    # emits 1..spec_gamma+1 verified tokens (exact greedy stream).
    # Sampled batches and near-full caches fall back to normal steps.
    speculative: bool = False
    spec_gamma: int = 4
    spec_ngram: int = 2
    # W4A8 (EXPERIMENTAL): per-token int8 activations into the full-K
    # planar kernel (integer-rate MXU dots). The isolated kernel wins
    # (-19% at M=32) but no measured end-to-end regime benefits yet:
    # batch-32 decode is attention/KV-bound (w4a16 1353.0 vs w4a8
    # 1354.5 tok/s, BENCH_r04) and prefill measured 7x slower on
    # gateup (tools/ab_a8_prefill.py) — the flag is gated decode-only.
    # Sets QLLM_TPU_W4A8 process-wide at engine construction (the flag
    # is read at kernel trace time), so don't mix w4a8 and non-w4a8
    # engines in one process. ~1% extra relative error vs W4A16.
    w4a8: bool = False


@dataclasses.dataclass
class Request:
    uid: int
    prompt: np.ndarray  # [T] int32
    max_new_tokens: int = 128
    # None = greedy; SamplingParams enables temperature/top-k/top-p for
    # this request only (mixed batches share one compiled sampled step)
    sampling: Optional["SamplingParams"] = None  # noqa: F821
    # id from engine.register_prefix: the prompt must start with that
    # prefix; admission stamps the cached prefix KV and prefills only
    # the suffix
    prefix_id: Optional[int] = None
    # filled by the engine:
    output: List[int] = dataclasses.field(default_factory=list)
    finished: bool = False
    submitted_at: float = 0.0
    first_token_at: Optional[float] = None
    finished_at: Optional[float] = None
    # speculative-decoding telemetry: one "forward" = one verify
    # dispatch for this request's slot; emitted counts the tokens that
    # round produced (accepted draft prefix + the bonus token)
    spec_forwards: int = 0
    spec_emitted: int = 0

    @property
    def spec_tokens_per_forward(self) -> Optional[float]:
        """Mean verified tokens per speculative forward (None when the
        request never took a speculative step)."""
        if not self.spec_forwards:
            return None
        return self.spec_emitted / self.spec_forwards


@partial(jax.jit, static_argnames=("cfg",))
def _batched_decode_step(
    params, cfg: ModelConfig, tokens, cache, positions, sampling=None, key=None
):
    """tokens [B, 1], positions int32 [B] -> (next_tokens [B], cache).
    ``sampling``: (temperature, top_k, top_p) per-slot arrays (None =
    all-greedy trace, no sort in the step)."""
    logits, cache = forward(params, cfg, tokens, cache, pos=positions)
    last = logits[:, -1, :]
    if sampling is None:
        return jnp.argmax(last, axis=-1).astype(jnp.int32), cache
    t, k, p = sampling
    return sample_logits(last, key, t, k, p), cache


@partial(jax.jit, static_argnames=("cfg", "steps", "eos"))
def _batched_decode_multi(
    params,
    cfg: ModelConfig,
    tokens,
    cache,
    positions,
    active,
    steps: int,
    eos,
    sampling=None,
    key=None,
):
    """``steps`` decode steps fully on-device (one dispatch): next
    tokens (greedy, or sampled when ``sampling`` arrays are given)
    chained per slot, eos-aware freezing. Inactive/finished slots keep
    decoding into their own positions but their outputs are masked.

    Returns (token trace [B, steps], final tokens [B,1], cache,
    positions, active)."""

    def body(carry, i):
        tokens, cache, positions, active = carry
        logits, cache = forward(params, cfg, tokens, cache, pos=positions)
        last = logits[:, -1, :]
        if sampling is None:
            nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
        else:
            t, k, p = sampling
            nxt = sample_logits(last, jax.random.fold_in(key, i), t, k, p)
        if eos is not None:
            now_finished = nxt == eos
        else:
            now_finished = jnp.zeros_like(nxt, dtype=bool)
        emit = jnp.where(active, nxt, -1)
        positions = positions + active.astype(jnp.int32)
        active = active & (~now_finished)
        tokens = jnp.where(active[:, None], nxt[:, None], tokens)
        return (tokens, cache, positions, active), emit

    (tokens, cache, positions, active), trace = jax.lax.scan(
        body, (tokens, cache, positions, active), jnp.arange(steps)
    )
    return trace.T, tokens, cache, positions, active


@partial(jax.jit, static_argnames=("cfg", "gamma", "ngram", "eos"))
def _batched_spec_step(
    params,
    cfg: ModelConfig,
    tokens,  # [B, 1] last emitted token per slot
    cache,
    positions,  # [B] int32 — cache offset of `tokens`
    active,  # [B] bool
    history,  # [B, S] int32 token history (prompt + emitted)
    hist_len,  # [B] int32
    gamma: int,
    ngram: int,
    eos,
):
    """One speculative round for the whole batch: draft gamma tokens per
    slot from its history, verify in ONE forward over gamma+1 positions,
    emit the agreeing prefix + bonus token (cut at eos). Rejected-draft
    KV is overwritten before it is ever visible (models.speculative
    docstring). Returns (emit [B, gamma+1], emit_len [B], next tokens,
    cache, positions, active)."""
    from ..models.speculative import ngram_draft

    draft = ngram_draft(history, hist_len, gamma, ngram)
    seq = jnp.concatenate([tokens, draft], axis=1)  # [B, 1+g]
    logits, cache = forward(params, cfg, seq, cache, pos=positions)
    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, 1+g]
    el, tokens, positions, active2 = _spec_accept(
        nxt, draft, tokens, positions, active, eos
    )
    return nxt, el, tokens, cache, positions, active2


def _spec_accept(nxt, draft, tokens, positions, active, eos):
    """Shared speculative acceptance math: longest agreeing prefix +
    bonus token, cut at eos. Returns (emit_len, next tokens, positions,
    active)."""
    B = tokens.shape[0]
    match = (draft == nxt[:, :-1]).astype(jnp.int32)
    el = jnp.cumprod(match, axis=1).sum(axis=1) + 1  # [B] in [1, g+1]
    finished_now = jnp.zeros((B,), bool)
    if eos is not None:
        iseos = nxt == eos
        eos_idx = jnp.argmax(iseos, axis=1)
        hit = jnp.any(iseos, axis=1) & (eos_idx < el)
        el = jnp.where(hit, eos_idx + 1, el)
        finished_now = hit
    el = jnp.where(active, el, 0)
    last = jnp.take_along_axis(nxt, jnp.maximum(el - 1, 0)[:, None], axis=1)
    positions = positions + el
    active2 = active & (~finished_now)
    tokens = jnp.where(active2, last[:, 0], tokens[:, 0])[:, None]
    return el, tokens, positions, active2


@partial(jax.jit, static_argnames=("cfg",))
def _prefill_one(params, cfg: ModelConfig, tokens, cache, length):
    """Right-padded prompt [1, Tb]; only positions < length are real.
    Returns (last real position's logits [1, V], cache) — the first
    token is picked outside (greedy or sampled per request)."""
    logits, cache = forward(params, cfg, tokens, cache, pos=jnp.int32(0))
    last = jnp.take_along_axis(
        logits, (length - 1)[None, None, None], axis=1
    )[:, 0]
    return last, cache


@partial(jax.jit, static_argnames=("cfg",))
def _prefill_chunk(params, cfg: ModelConfig, tokens, cache, offset, length):
    """One chunk [1, C] of a long prompt at position ``offset``; returns
    the logits after the LAST REAL position (only meaningful on the
    final chunk, where offset + real <= offset + C = length pad)."""
    logits, cache = forward(params, cfg, tokens, cache, pos=offset)
    last = jnp.take_along_axis(
        logits, jnp.maximum(length - offset - 1, 0)[None, None, None], axis=1
    )[:, 0]
    return last, cache


@jax.jit
def _pick_first(last, key, t, k, p):
    """First-token pick from prefill logits ([1, V]); t<=0 -> greedy."""
    return sample_logits(last, key, t, k, p)


class ContinuousBatchingEngine:
    def __init__(self, params, cfg: ModelConfig, serve_cfg: ServeConfig):
        from ..models.moe import has_stackable_experts, stack_experts

        if has_stackable_experts(params):
            # MoE serving: hybrid stacking — [L]-stacked attention
            # (tuned kernels + fused qkv) with per-layer [E]-stacked
            # experts so decode reads only the top-k experts per token
            # (models.moe / models.stacked). bf16 scale storage
            # (QLLM_TPU_SCALES_BF16, default on) additionally qualifies
            # the grouped expert kernel on TPU — f32-scale planar
            # stacks cannot run the fused kernel there.
            import os

            from ..models.stacked import stack_layer_params_hybrid

            scales_bf16 = (
                os.environ.get("QLLM_TPU_SCALES_BF16", "1") != "0"
            )
            params = stack_layer_params_hybrid(
                {**params, "layers": [dict(lp) for lp in params["layers"]]},
                scale_store_dtype=(
                    jnp.bfloat16 if scales_bf16 else jnp.float32
                ),
            )
        self.params = params
        self.cfg = cfg
        self.scfg = serve_cfg
        if serve_cfg.w4a8:
            import os

            os.environ["QLLM_TPU_W4A8"] = "1"
        B = serve_cfg.max_batch
        self.cache = make_cache(
            cfg, B, serve_cfg.max_seq, serve_cfg.quantized_kv
        )
        self.slot_req: List[Optional[Request]] = [None] * B
        self.positions = np.zeros(B, np.int32)  # next write offset/slot
        self.tokens = np.zeros((B, 1), np.int32)  # next token to feed
        # per-slot sampling params (temp<=0 = greedy slot)
        self.samp_t = np.zeros(B, np.float32)
        self.samp_k = np.zeros(B, np.int32)
        self.samp_p = np.ones(B, np.float32)
        self._key = jax.random.key(serve_cfg.seed)
        self._dispatches = 0  # folds the engine key per dispatch
        if serve_cfg.speculative:
            # per-slot token history for n-gram drafting; sized so a
            # final gamma+1 write at hist_len == max_seq still fits
            self.history = np.zeros(
                (B, serve_cfg.max_seq + serve_cfg.spec_gamma + 1), np.int32
            )
            self.hist_len = np.zeros(B, np.int32)
        self.queue: deque[Request] = deque()
        self._uid = 0
        # prefix cache: id -> (tokens, mini KV cache with [0, Tp) filled)
        self._prefixes: Dict[int, tuple] = {}
        # in-flight chunked admission: (req, slot, mini_cache, done_toks)
        self._admitting: Optional[tuple] = None

    # ------------------------------------------------- backend step hooks
    # (the TP engine overrides these with shard_map-wrapped versions)

    def _fn_decode_step(self, tokens, cache, positions, sampling, key):
        return _batched_decode_step(
            self.params, self.cfg, tokens, cache, positions, sampling, key
        )

    def _fn_decode_multi(
        self, tokens, cache, positions, active, steps, sampling, key
    ):
        return _batched_decode_multi(
            self.params,
            self.cfg,
            tokens,
            cache,
            positions,
            active,
            steps,
            self.scfg.eos_token_id,
            sampling,
            key,
        )

    def _fn_spec_step(
        self, tokens, cache, positions, active, history, hist_len
    ):
        return _batched_spec_step(
            self.params,
            self.cfg,
            tokens,
            cache,
            positions,
            active,
            history,
            hist_len,
            self.scfg.spec_gamma,
            self.scfg.spec_ngram,
            self.scfg.eos_token_id,
        )

    def _fn_prefill_one(self, tokens, cache, length):
        return _prefill_one(self.params, self.cfg, tokens, cache, length)

    def _fn_prefill_chunk(self, tokens, cache, offset, length):
        return _prefill_chunk(
            self.params, self.cfg, tokens, cache, offset, length
        )

    def _make_mini_cache(self, Tcap):
        return make_cache(self.cfg, 1, Tcap, self.scfg.quantized_kv)

    # ----------------------------------------------------------------- API

    def submit(
        self,
        prompt,
        max_new_tokens: int = 128,
        sampling: Optional[SamplingParams] = None,
        prefix_id: Optional[int] = None,
    ) -> Request:
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        if prefix_id is not None:
            ptoks, _ = self._prefixes[prefix_id]  # KeyError = unknown id
            Tp = len(ptoks)
            if len(prompt) <= Tp or not np.array_equal(prompt[:Tp], ptoks):
                raise ValueError(
                    "prompt must extend the registered prefix by >= 1 "
                    "token (prefix caching reuses its KV verbatim)"
                )
        self._uid += 1
        req = Request(
            uid=self._uid,
            prompt=prompt,
            max_new_tokens=max_new_tokens,
            sampling=sampling,
            prefix_id=prefix_id,
            submitted_at=time.time(),
        )
        self.queue.append(req)
        return req

    def register_prefix(self, tokens) -> int:
        """Prefill a shared prompt prefix (e.g. a system prompt) ONCE and
        cache its KV; subsequent submit(prefix_id=...) admissions stamp
        it in and prefill only the suffix. Returns the prefix id."""
        toks = np.asarray(tokens, np.int32).reshape(-1)
        Tp = len(toks)
        if Tp < 1:
            raise ValueError("empty prefix")
        Tb = self._bucket(Tp)
        padded = np.zeros((1, Tb), np.int32)
        padded[0, :Tp] = toks
        mini = self._make_mini_cache(Tb)
        _, mini = self._fn_prefill_one(
            jnp.asarray(padded), mini, jnp.int32(Tp)
        )
        pid = len(self._prefixes)
        self._prefixes[pid] = (toks, mini)
        return pid

    def run(self, on_token: Optional[Callable] = None) -> List[Request]:
        """Drive until queue and slots drain. Returns finished requests."""
        done: List[Request] = []
        while self.queue or any(r is not None for r in self.slot_req):
            self._admit()
            self._step(on_token)
            done.extend(self._reap())
        return done

    def step(self, on_token: Optional[Callable] = None) -> List[Request]:
        """One admission + one batched decode step (for external loops)."""
        self._admit()
        self._step(on_token)
        return self._reap()

    # ------------------------------------------------------------ internals

    def _bucket(self, t: int) -> int:
        for b in self.scfg.prefill_buckets:
            if t <= b:
                return b
        return self.scfg.max_seq

    def _next_key(self) -> jax.Array:
        self._dispatches += 1
        return jax.random.fold_in(self._key, self._dispatches)

    def _finish_admission(self, req, slot, mini, last_logits) -> None:
        self.cache = self.cache.insert_slot(slot, mini)
        T = len(req.prompt)
        sp = req.sampling or SamplingParams()
        self.samp_t[slot] = sp.temperature
        self.samp_k[slot] = sp.top_k
        self.samp_p[slot] = sp.top_p
        first_tok = _pick_first(
            last_logits,
            self._next_key(),
            jnp.asarray([sp.temperature], jnp.float32),
            jnp.asarray([sp.top_k], jnp.int32),
            jnp.asarray([sp.top_p], jnp.float32),
        )
        req.first_token_at = time.time()
        req.output.append(int(first_tok[0]))
        self.slot_req[slot] = req
        self.positions[slot] = T
        self.tokens[slot, 0] = int(first_tok[0])
        if self.scfg.speculative:
            self.history[slot, :T] = req.prompt
            self.history[slot, T] = int(first_tok[0])
            self.history[slot, T + 1 :] = 0
            self.hist_len[slot] = T + 1

    def _admit(self) -> None:
        """Admission with CHUNKED prefill: at most ``prefill_chunk``
        prompt tokens are processed per engine iteration, so a long
        prompt's prefill interleaves with decode steps instead of
        stalling every active stream until it completes (the
        reference-shaped one-shot admission was VERDICT weak #6)."""
        C = max(1, self.scfg.prefill_chunk)
        # continue an in-flight chunked admission (one chunk per call)
        if self._admitting is not None:
            req, slot, mini, done = self._admitting
            T = len(req.prompt)
            n = min(C, T - done)
            chunk = np.zeros((1, C), np.int32)
            chunk[0, :n] = req.prompt[done : done + n]
            last_logits, mini = self._fn_prefill_chunk(
                jnp.asarray(chunk), mini, jnp.int32(done), jnp.int32(T)
            )
            done += n
            if done >= T:
                self._finish_admission(req, slot, mini, last_logits)
                self._admitting = None
            else:
                self._admitting = (req, slot, mini, done)
            return  # at most one chunk of prefill work per iteration
        while self.queue and None in self.slot_req:
            slot = self.slot_req.index(None)
            req = self.queue.popleft()
            T = len(req.prompt)
            Tb = self._bucket(T)
            if req.prefix_id is not None:
                # stamp the cached prefix KV, then prefill ONLY the
                # suffix (admission cost drops from O(T) to O(T - Tp))
                ptoks, pmini = self._prefixes[req.prefix_id]
                Tp = len(ptoks)
                rem = T - Tp
                if rem <= C:
                    # one suffix window, bucketed to bound compile count
                    Sb = self._bucket(rem)
                    if Tp + Sb > self.scfg.max_seq:
                        Sb = rem  # exact window (rare near-full case)
                    Tcap = min(
                        max(Tb, Tp + Sb, pmini.max_seq), self.scfg.max_seq
                    )
                    mini = self._make_mini_cache(Tcap).insert_seq(pmini, 0)
                    window = np.zeros((1, Sb), np.int32)
                    window[0, :rem] = req.prompt[Tp:]
                    last_logits, mini = self._fn_prefill_chunk(
                        jnp.asarray(window),
                        mini,
                        jnp.int32(Tp),
                        jnp.int32(T),
                    )
                    self._finish_admission(req, slot, mini, last_logits)
                    continue
                # long suffix: the chunk windows start at Tp (not
                # C-aligned) — size the cache so the last [Tp+k*C, +C)
                # window fits without dynamic_update_slice clamp-shifting
                # onto the prefix KV
                span = Tp + -(-rem // C) * C
                Tcap = min(max(Tb, span), self.scfg.max_seq)
                mini = self._make_mini_cache(Tcap).insert_seq(pmini, 0)
                self.slot_req[slot] = req  # reserve the slot
                self.positions[slot] = 0
                self._admitting = (req, slot, mini, Tp)
                self._admit()  # process the first suffix chunk now
                return
            if T > C:
                # long prompt: chunked admission over the next calls;
                # pad the mini cache to a whole number of chunks
                Tcap = min(max(Tb, -(-T // C) * C), self.scfg.max_seq)
                mini = self._make_mini_cache(Tcap)
                self.slot_req[slot] = req  # reserve the slot
                self.positions[slot] = 0
                self._admitting = (req, slot, mini, 0)
                self._admit()  # process the first chunk now
                return
            padded = np.zeros((1, Tb), np.int32)
            padded[0, :T] = req.prompt
            mini = self._make_mini_cache(Tb)
            last_logits, mini = self._fn_prefill_one(
                jnp.asarray(padded), mini, jnp.int32(T)
            )
            self._finish_admission(req, slot, mini, last_logits)
            if self._req_done(req):
                pass  # reaped after the next step scan

    def _step(self, on_token) -> None:
        adm_slot = None if self._admitting is None else self._admitting[1]
        act = [
            s
            for s, r in enumerate(self.slot_req)
            if r is not None and not r.finished and s != adm_slot
        ]
        if not act:
            return
        if (
            self.scfg.speculative
            and not any(self.samp_t[s] > 0 for s in act)
            and all(
                self.positions[s] + self.scfg.spec_gamma + 1
                <= self.scfg.max_seq
                for s in act
            )
        ):
            self._step_spec(act, on_token)
            return
        chunk = max(1, self.scfg.decode_chunk)
        if chunk > 1:
            rem = min(
                self.slot_req[s].max_new_tokens - len(self.slot_req[s].output)
                for s in act
            )
            room = min(
                self.scfg.max_seq - 1 - int(self.positions[s]) for s in act
            )
            steps = max(1, min(chunk, rem, room))
        else:
            steps = 1
        if steps > 1:
            self._step_multi(act, steps, on_token)
            return
        next_tokens, self.cache = self._fn_decode_step(
            jnp.asarray(self.tokens),
            self.cache,
            jnp.asarray(self.positions),
            *self._sampling_args(act),
        )
        next_np = np.asarray(next_tokens)
        for slot in act:
            req = self.slot_req[slot]
            self.positions[slot] += 1
            if self._req_done(req):
                continue
            tok = int(next_np[slot])
            req.output.append(tok)
            self.tokens[slot, 0] = tok
            if on_token is not None:
                on_token(req, tok)

    def _sampling_args(self, act) -> tuple:
        """(sampling, key) for the jitted steps: (None, None) when every
        active slot is greedy — keeps the hot all-greedy trace free of
        the [B, V] sort."""
        if not any(self.samp_t[s] > 0 for s in act):
            return (None, None)
        return (
            (
                jnp.asarray(self.samp_t),
                jnp.asarray(self.samp_k),
                jnp.asarray(self.samp_p),
            ),
            self._next_key(),
        )

    def _step_spec(self, act, on_token) -> None:
        """One speculative round: up to spec_gamma+1 verified greedy
        tokens per active slot from a single forward."""
        B = self.scfg.max_batch
        active = np.zeros(B, bool)
        active[act] = True
        emit, el, toks, self.cache, pos, _ = self._fn_spec_step(
            jnp.asarray(self.tokens),
            self.cache,
            jnp.asarray(self.positions),
            jnp.asarray(active),
            jnp.asarray(self.history),
            jnp.asarray(self.hist_len),
        )
        emit_np = np.asarray(emit)
        el_np = np.asarray(el)
        toks_np = np.asarray(toks)
        pos_np = np.asarray(pos)
        for s in act:
            req = self.slot_req[s]
            n = int(el_np[s])
            req.spec_forwards += 1
            req.spec_emitted += n
            hl = int(self.hist_len[s])
            self.history[s, hl : hl + n] = emit_np[s, :n]
            self.hist_len[s] = hl + n
            for t in emit_np[s, :n]:
                if self._req_done(req):
                    break
                req.output.append(int(t))
                if on_token is not None:
                    on_token(req, int(t))
            self.positions[s] = int(pos_np[s])
            self.tokens[s, 0] = int(toks_np[s, 0])
            self._req_done(req)

    def _step_multi(self, act, steps: int, on_token) -> None:
        B = self.scfg.max_batch
        active = np.zeros(B, bool)
        active[act] = True
        trace, toks, self.cache, pos, _ = self._fn_decode_multi(
            jnp.asarray(self.tokens),
            self.cache,
            jnp.asarray(self.positions),
            jnp.asarray(active),
            steps,
            *self._sampling_args(act),
        )
        trace_np = np.asarray(trace)
        pos_np = np.asarray(pos)
        toks_np = np.asarray(toks)
        for s in act:
            req = self.slot_req[s]
            for t in trace_np[s]:
                if t < 0 or self._req_done(req):
                    break
                req.output.append(int(t))
                if on_token is not None:
                    on_token(req, int(t))
            self.positions[s] = int(pos_np[s])
            self.tokens[s, 0] = int(toks_np[s, 0])
            self._req_done(req)

    def _req_done(self, req: Request) -> bool:
        eos = self.scfg.eos_token_id
        if len(req.output) >= req.max_new_tokens:
            req.finished = True
        elif eos is not None and req.output and req.output[-1] == eos:
            req.finished = True
        return req.finished

    def _reap(self) -> List[Request]:
        out = []
        adm_slot = None if self._admitting is None else self._admitting[1]
        for slot, req in enumerate(self.slot_req):
            if slot == adm_slot:
                continue  # mid-prefill: no KV in the main cache yet
            if req is not None and self._req_done(req):
                req.finished_at = time.time()
                self.slot_req[slot] = None
                self.positions[slot] = 0
                out.append(req)
        return out
