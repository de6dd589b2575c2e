"""Probe: fused Pallas conv-stack (ops/conv_block) vs the XLA chain at
bench shapes (C=512 clients, B=32, bf16, per-client weights).

Measures the fwd-only and fwd+bwd (VALUE and grad wrt weights) of the
segment the kernel replaces: conv1(1→32)+relu+pool → conv2(32→64)+relu+pool.

NB (round-5 correction): the fwd+bwd column MUST use value_and_grad. The
fused backward is residual-free and the loss cotangent here is a constant
(r), so under plain jax.grad the forward Pallas kernel is DEAD CODE and
XLA deletes it — the round-4 "fwd+bwd 28.3 ms" row measured the backward
kernel alone, which made "bwd = 28.3 − 16.4 = 11.9 ms" (and the 1.85×
claim built on it) an artifact. The backward kernel's true cost is
~25.2 ms at these shapes in every context (hlo self-time, round-5
bisection table in docs/performance.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from _bench_util import log, timeit  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fl_tpu.ops.conv_block import conv_stack  # noqa: E402

C = int(os.environ.get("BENCH_C", "512"))
B = 32


def ref_stack(x, w1, b1, w2, b2):
    conv = lambda v, w: jax.lax.conv_general_dilated(  # noqa: E731
        v, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # NB: init value must be a CONSTANT — a traced init breaks
    # linearization under vmap ("Linearization failed to produce known
    # values for all output primals")
    pool = lambda v: jax.lax.reduce_window(  # noqa: E731
        v, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    a1 = jax.nn.relu(conv(x, w1) + b1)
    x2 = pool(a1)
    a2 = jax.nn.relu(conv(x2, w2) + b2)
    return pool(a2)


def main():
    log(f"devices: {jax.devices()}  C={C} B={B} bf16 conv stack")
    dt = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (C, B, 28, 28, 1), dt)
    w1 = jax.random.normal(ks[1], (C, 3, 3, 1, 32), dt) * 0.5
    b1 = jax.random.normal(ks[2], (C, 32), dt) * 0.1
    w2 = jax.random.normal(ks[3], (C, 3, 3, 32, 64), dt) * 0.1
    b2 = jax.random.normal(ks[4], (C, 64), dt) * 0.1
    r = jax.random.normal(ks[5], (C, B, 7, 7, 64), dt)

    # one-client numeric sanity on device
    got = jax.vmap(conv_stack)(x[:2], w1[:2], b1[:2], w2[:2], b2[:2])
    want = ref_stack(x[0], w1[0], b1[0], w2[0], b2[0])
    err = float(jnp.max(jnp.abs(got[0].astype(jnp.float32)
                                - want.astype(jnp.float32))))
    log(f"fwd parity (1 client, bf16): max abs err {err:.3e}")

    def loss_of(stack):
        def loss(xx, p1, q1, p2, q2):
            out = jax.vmap(stack)(xx, p1, q1, p2, q2)
            return jnp.sum((out * r).astype(jnp.float32))
        return loss

    variants = []
    if os.environ.get("PROBE_SKIP_BASE") != "1":
        variants += [("xla ", ref_stack), ("plas", conv_stack)]
    for name, stack in variants:
        fn = jax.jit(loss_of(stack))
        ms, cs = timeit(fn, x, w1, b1, w2, b2)
        log(f"{name} fwd-only      : {ms:8.2f} ms (compile {cs:.0f}s)")
        # value_and_grad keeps the forward kernel LIVE (see module NB)
        gfn = jax.jit(jax.value_and_grad(loss_of(stack),
                                         argnums=(1, 2, 3, 4)))
        ms, cs = timeit(gfn, x, w1, b1, w2, b2)
        log(f"{name} fwd+wgrads    : {ms:8.2f} ms (compile {cs:.0f}s)")

    # client-packed variant: vmap over pairs, P=2 packed on the lanes
    from fl_tpu.ops.conv_block import conv_stack_packed

    P = 2
    pair = lambda t: t.reshape((C // P, P) + t.shape[1:])  # noqa: E731
    xp, w1p, b1p, w2p, b2p, rp = map(pair, (x, w1, b1, w2, b2, r))

    def loss_packed(xx, p1, q1, p2, q2):
        out = jax.vmap(conv_stack_packed)(xx, p1, q1, p2, q2)
        return jnp.sum((out * rp).astype(jnp.float32))

    fn = jax.jit(loss_packed)
    ms, cs = timeit(fn, xp, w1p, b1p, w2p, b2p)
    log(f"pack fwd-only      : {ms:8.2f} ms (compile {cs:.0f}s)")
    gfn = jax.jit(jax.value_and_grad(loss_packed, argnums=(1, 2, 3, 4)))
    ms, cs = timeit(gfn, xp, w1p, b1p, w2p, b2p)
    log(f"pack fwd+wgrads    : {ms:8.2f} ms (compile {cs:.0f}s)")


if __name__ == "__main__":
    main()
