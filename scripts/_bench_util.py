"""Shared helpers for the TPU microbenchmark scripts.

One home for the axon-relay quirks so a fix applies everywhere:
- timing syncs via a host scalar read (``jax.block_until_ready`` is not a
  reliable barrier over the axon relay — docs/performance.md);
- the persistent compile cache is configured on import.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache is an optimization, not a requirement
    pass


def log(msg):
    print(msg, flush=True)


def _sync(out):
    """Force a host scalar read of a result pytree (the reliable barrier)."""
    float(jnp.sum(out) if isinstance(out, jax.Array) else sum(
        jnp.sum(o) for o in jax.tree.leaves(out)))


def timeit(fn, *args, iters=20, warmup=2):
    """Returns (ms per call, compile+warmup seconds)."""
    t0 = time.perf_counter()
    for _ in range(warmup):
        _sync(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3, compile_s


def lax_conv3x3(x, w):
    """3x3 stride-1 SAME conv, NHWC/HWIO — the XLA baseline formulation."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
