"""Test harness: run everything on a virtual 8-device CPU mesh.

(The driver separately validates the TPU path; tests must be
hardware-independent — SURVEY.md §4 "Implication for the rebuild".)
"""

import os

# The image sets JAX_PLATFORMS=axon globally (TPU tunnel), so a plain
# setdefault is not enough — force CPU both via env (for subprocesses)
# and via jax.config (the env may already have been consumed by the
# sitecustomize's eager backend registration).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
