"""Chat plugin: CLI chat loop with streaming decode and tokens/s report.

Reference qllm/plugin/ (conversation.py:5-13, chatcli/inference.py:21-109,
chatcli/generation.py:5-115): llama2 conversation template, greedy
KV-cache decode, per-session tokens/s. Decode here is the jitted
decode_step with the quantized KV cache.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterator, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["Conversation", "generate_stream", "chat_loop", "loop_in_chat_completion"]


@dataclasses.dataclass
class Conversation:
    """llama-2 chat template (reference chatcli/conversation.py:5-96)."""

    system: str = (
        "You are a helpful, respectful and honest assistant. Always answer "
        "as helpfully as possible."
    )
    messages: List[Tuple[str, str]] = dataclasses.field(default_factory=list)

    def append(self, role: str, text: str) -> None:
        self.messages.append((role, text))

    def prompt(self) -> str:
        out = f"<s>[INST] <<SYS>>\n{self.system}\n<</SYS>>\n\n"
        first = True
        for role, text in self.messages:
            if role == "user":
                out += text if first else f"<s>[INST] {text}"
                out += " [/INST]"
                first = False
            else:
                out += f" {text} </s>"
        return out


def generate_stream(
    params,
    cfg,
    tokenizer,
    prompt: str,
    max_new_tokens: int = 256,
    quantized_kv: bool = True,
    sampling=None,  # models.sampling.SamplingParams or None = greedy
) -> Iterator[str]:
    """Streaming decode, greedy by default (reference generation.py
    generate_stream is greedy-only; ``sampling`` adds temperature /
    top-k / top-p on top)."""
    import jax

    from ..models.generate import decode_step, make_cache, prefill
    from ..models.sampling import params_arrays, sample_logits

    ids = tokenizer(prompt, return_tensors="np").input_ids.astype(np.int32)
    T = ids.shape[1]
    max_seq = ((T + max_new_tokens + 127) // 128) * 128
    cache = make_cache(cfg, 1, max_seq, quantized_kv)
    logits, cache = prefill(params, cfg, jnp.asarray(ids), cache)

    if sampling is not None and sampling.temperature > 0:
        t, k, p = params_arrays([sampling])
        key = jax.random.key(sampling.seed)

        def pick(lg, pos):
            return sample_logits(
                lg, jax.random.fold_in(key, pos), t, k, p
            ).astype(jnp.int32)[:, None]

    else:

        def pick(lg, pos):
            return jnp.argmax(lg, axis=-1).astype(jnp.int32)[:, None]

    token = pick(logits, T - 1)
    eos = tokenizer.eos_token_id
    emitted = []
    for i in range(max_new_tokens):
        tid = int(token[0, 0])
        if eos is not None and tid == eos:
            break
        emitted.append(tid)
        text = tokenizer.decode(emitted, skip_special_tokens=True)
        yield text
        logits, cache = decode_step(params, cfg, token, cache, jnp.int32(T + i))
        token = pick(logits, T + i)


def chat_loop(
    params,
    cfg,
    tokenizer,
    max_new_tokens: int = 256,
    quantized_kv: bool = True,
    inp: Optional[callable] = None,
    outp: Optional[callable] = None,
    sampling=None,
) -> None:
    """Interactive chat (reference chatcli/inference.py:21-109)."""
    inp = inp or (lambda: input("USER: "))
    outp = outp or (lambda s: print(s, end="", flush=True))
    conv = Conversation()
    while True:
        try:
            text = inp()
        except EOFError:
            break
        if not text or text.strip() in ("exit", "quit", "!!exit"):
            break
        conv.append("user", text)
        t0 = time.time()
        reply = ""
        outp("ASSISTANT: ")
        last_len = 0
        n_tokens = 0
        for partial in generate_stream(
            params,
            cfg,
            tokenizer,
            conv.prompt(),
            max_new_tokens,
            quantized_kv,
            sampling,
        ):
            outp(partial[last_len:])
            last_len = len(partial)
            reply = partial
            n_tokens += 1
        dt = time.time() - t0
        outp(f"\n[{n_tokens} tokens, {n_tokens / max(dt, 1e-6):.1f} tok/s]\n")
        conv.append("assistant", reply)


class DistChatIO:
    """Multi-host chat IO (reference chatcli/chatio.py:60-112 DistChatIO):
    process 0 reads user input and broadcasts it; non-zero processes
    stay silent. Uses jax multihost broadcast instead of mpi4py."""

    def __init__(self):
        import jax

        self.rank = jax.process_index()

    def inp(self) -> str:
        import jax
        import numpy as np
        from jax.experimental import multihost_utils

        text = input("USER: ") if self.rank == 0 else ""
        buf = np.frombuffer(
            text.encode()[:4096].ljust(4096, b"\x00"), dtype=np.uint8
        ).copy()
        buf = multihost_utils.broadcast_one_to_all(buf)
        return bytes(buf).rstrip(b"\x00").decode()

    def outp(self, s: str) -> None:
        if self.rank == 0:
            print(s, end="", flush=True)


def loop_in_chat_completion(params, cfg, tokenizer, args=None) -> None:
    """Entry used by the orchestrator (reference plugin/conversation.py:5-13)."""
    import jax

    if tokenizer is None:
        raise RuntimeError("chat plugin needs a tokenizer")
    kwargs = dict(
        max_new_tokens=getattr(args, "max_new_tokens", 256) if args else 256,
        quantized_kv=getattr(args, "kv_quant", True) if args else True,
    )
    if args is not None and getattr(args, "w4a8", False):
        import os

        os.environ["QLLM_TPU_W4A8"] = "1"  # read at kernel trace time
    temp = float(getattr(args, "temperature", 0.0) or 0.0) if args else 0.0
    if temp > 0:
        from ..models.sampling import SamplingParams

        kwargs["sampling"] = SamplingParams(
            temperature=temp,
            top_k=int(getattr(args, "top_k", 0) or 0),
            top_p=float(getattr(args, "top_p", 1.0) or 1.0),
            seed=int(getattr(args, "seed", 0) or 0),
        )
    if jax.process_count() > 1:
        io = DistChatIO()
        kwargs.update(inp=io.inp, outp=io.outp)
    chat_loop(params, cfg, tokenizer, **kwargs)
