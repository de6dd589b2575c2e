"""Microbenchmark: per-client-weights 3x3 conv formulations on TPU.

Round-2 perf work (VERDICT #2 / docs/performance.md): the vmapped conv
backward is 34 of 85 ms/step on the 512-client bench. Candidate fix: express
the 3x3 SAME conv as 9 shifted batched GEMMs (clients as the dot_general
batch axis) with a custom VJP whose dgrad/wgrad are also shifted GEMMs —
mapping the whole conv stack onto the MXU as large batched matmuls instead
of XLA's grouped-conv lowering of a doubly-vmapped conv.

Measures, at bench shapes (C=512, B=32):
  conv2 (14x14, 32->64, the FLOPs king) and conv1 (28x28, 1->32):
    - vmapped lax.conv fwd / fwd+bwd           (current formulation)
    - shift-GEMM fwd / fwd+bwd (custom VJP)    (candidate)

Numerics of the candidate are asserted against lax.conv on CPU in
tests/test_ops.py; this script measures wall time only. Timing uses a
scalar host read for sync (block_until_ready is unreliable over the axon
relay — docs/performance.md). Each variant prints as soon as it is
measured so partial runs are still informative.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from _bench_util import lax_conv3x3 as lax_conv, log, timeit  # noqa: E402

from fl_tpu.ops.conv import conv3x3_same

C = int(os.environ.get("BENCH_C", "512"))
B = 32



def bench_shape(name, H, W, I, O, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    kx, kw, kg = jax.random.split(key, 3)
    x = jax.random.normal(kx, (C, B, H, W, I), dtype)
    w = jax.random.normal(kw, (C, 3, 3, I, O), dtype) * 0.1
    g = jax.random.normal(kg, (C, B, H, W, O), dtype)

    def make_fwdbwd(conv_fn):
        # g passed as an argument — closing over it embeds a ~400MB literal
        # in the HLO, which the axon remote-compile relay rejects (HTTP 413)
        def loss(x, w, g):
            y = conv_fn(x, w)
            return jnp.sum(y.astype(jnp.float32) * g.astype(jnp.float32))
        return jax.jit(jax.grad(loss, argnums=(0, 1)))

    variants = [
        ("lax.conv   fwd    ", jax.jit(jax.vmap(lax_conv)), (x, w)),
        ("shift-GEMM fwd    ", jax.jit(jax.vmap(conv3x3_same)), (x, w)),
        ("lax.conv   fwd+bwd", make_fwdbwd(jax.vmap(lax_conv)), (x, w, g)),
        ("shift-GEMM fwd+bwd", make_fwdbwd(jax.vmap(conv3x3_same)), (x, w, g)),
    ]
    if os.environ.get("BENCH_PALLAS") == "1":
        from fl_tpu.ops.conv_pallas import conv3x3_pallas
        variants.append(
            ("pallas     fwd    ", jax.jit(jax.vmap(conv3x3_pallas)), (x, w)))
        variants.append(
            ("pallas     fwd+bwd", make_fwdbwd(jax.vmap(conv3x3_pallas)),
             (x, w, g)))
    for vname, fn, args in variants:
        try:
            ms, compile_s = timeit(fn, *args)
            log(f"[{name}] {vname}: {ms:8.2f} ms   (compile+warmup {compile_s:.0f}s)")
        except Exception as e:
            log(f"[{name}] {vname}: FAILED {type(e).__name__}: {str(e)[:200]}")


def bench_stem():
    """conv1+relu+pool: XLA stem (wgrad only — conv1 dgrad is dead code in
    the real model) vs the s2d Pallas stem."""
    import flax.linen as nn

    from fl_tpu.ops.conv_pallas import conv_stem_s2d

    def ref_stem(x, w, b):
        y = lax_conv(x, w) + b
        return nn.max_pool(nn.relu(y), (2, 2), strides=(2, 2))

    kx, kw, kb, kg = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(kx, (C, B, 28, 28, 1), jnp.bfloat16)
    w = jax.random.normal(kw, (C, 3, 3, 1, 32), jnp.bfloat16) * 0.3
    b = jax.random.normal(kb, (C, 32), jnp.bfloat16) * 0.1
    g = jax.random.normal(kg, (C, B, 14, 14, 32), jnp.bfloat16)

    def make_wgrad(stem):
        def loss(x, w, b, g):
            y = jax.vmap(stem)(x, w, b)
            return jnp.sum(y.astype(jnp.float32) * g.astype(jnp.float32))
        return jax.jit(jax.grad(loss, argnums=(1, 2)))

    variants = [
        ("xla stem  fwd      ", jax.jit(jax.vmap(ref_stem)), (x, w, b)),
        ("s2d stem  fwd      ", jax.jit(jax.vmap(conv_stem_s2d)), (x, w, b)),
        ("xla stem  fwd+wgrad", make_wgrad(ref_stem), (x, w, b, g)),
        ("s2d stem  fwd+wgrad", make_wgrad(conv_stem_s2d), (x, w, b, g)),
    ]
    for vname, fn, args in variants:
        try:
            ms, compile_s = timeit(fn, *args)
            log(f"[stem 28x28 1->32+pool] {vname}: {ms:8.2f} ms   "
                f"(compile+warmup {compile_s:.0f}s)")
        except Exception as e:
            log(f"[stem 28x28 1->32+pool] {vname}: FAILED "
                f"{type(e).__name__}: {str(e)[:200]}")


def main():
    log(f"devices: {jax.devices()}  C={C} B={B}")
    which = os.environ.get("BENCH_WHICH", "conv2,stem")
    if "conv2" in which:
        bench_shape("conv2 14x14 32->64", 14, 14, 32, 64)
    if "conv1" in which:
        bench_shape("conv1 28x28  1->32", 28, 28, 1, 32)
    if "stem" in which:
        bench_stem()


if __name__ == "__main__":
    main()
