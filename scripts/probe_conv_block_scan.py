"""Probe: the fused conv segment inside a 10-step scan (the in-program
context) vs a single call — isolates why the bwd kernel's in-program
self-time (~25 ms/step, round-4 profile) exceeds the standalone probe's
(~12 ms/step)."""

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
STEPS = 10


def main():
    log(f"devices: {jax.devices()}  C={C} B={B} bf16, {STEPS}-step scan")
    dt = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (C, B, 28, 28, 1), dt)
    w1 = jax.random.normal(ks[1], (C, 3, 3, 1, 32), jnp.float32) * 0.5
    b1 = jax.random.normal(ks[2], (C, 32), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (C, 3, 3, 32, 64), jnp.float32) * 0.1
    b2 = jax.random.normal(ks[4], (C, 64), jnp.float32) * 0.1
    r = jax.random.normal(ks[5], (C, B, 7, 7, 64), dt)

    def client_loss(xx, p1, q1, p2, q2):
        out = conv_stack(xx, p1.astype(dt), q1.astype(dt),
                         p2.astype(dt), q2.astype(dt))
        return jnp.sum((out * r[0]).astype(jnp.float32))

    def one_step(params):
        p1, q1, p2, q2 = params
        g = jax.vmap(jax.grad(client_loss, argnums=(1, 2, 3, 4)))(
            x, p1, q1, p2, q2)
        return tuple(p - 1e-3 * d for p, d in zip(params, g))

    def scanned(p1, q1, p2, q2):
        params, _ = jax.lax.scan(
            lambda c, _: (one_step(c), ()), (p1, q1, p2, q2), None,
            length=STEPS)
        return jax.tree.map(lambda t: jnp.sum(t.astype(jnp.float32)),
                            params)

    fn = jax.jit(scanned)
    ms, cs = timeit(fn, w1, b1, w2, b2)
    log(f"scan {STEPS} steps       : {ms:8.2f} ms = {ms/STEPS:6.2f} ms/step"
        f" (compile {cs:.0f}s)")

    gfn = jax.jit(lambda *a: jax.tree.map(
        lambda t: jnp.sum(t.astype(jnp.float32)), one_step(a)))
    ms, cs = timeit(gfn, w1, b1, w2, b2)
    log(f"single step        : {ms:8.2f} ms (compile {cs:.0f}s)")


if __name__ == "__main__":
    main()
