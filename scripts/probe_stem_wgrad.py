"""Probe: conv1 wgrad via lane-major transposed-patch GEMM (pure XLA).

The bench's stem (conv1 28x28, I=1->O=32, per-client weights, C=512) has a
~25 ms wgrad under XLA's grouped-conv lowering (vs 5.35 ms fwd). Hypothesis:
an explicit patch-matrix GEMM with the patch TAP axis in sublanes and the
big M axis in lanes — P (9I, B*900) built from 9 lane-dim slices of the
spatially-flattened image — makes both the patch build and the GEMM
bandwidth-efficient, unlike the (M, 9) layout (lane dim 9 -> 14x pad bloat).

    dW (9I, O) = P (9I, M) @ dy_pad (M, O),  batched over clients by vmap.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from _bench_util import lax_conv3x3 as lax_conv, log, timeit  # noqa: E402

C = int(os.environ.get("BENCH_C", "512"))
B = 32
H = W = 28
I, O = 1, 32
Hp, Wp = H + 2, W + 2  # 30x30 SAME-padded grid


def wgrad_patchT(x, dy):
    """x (B,28,28,1), dy (B,28,28,32) -> dW (3,3,1,32). Lane-major patches."""
    M = Hp * Wp  # 900 positions per image, padded grid
    # flatten spatial into lanes; halo pad so every tap slice is in range
    xp = jnp.pad(x[..., 0], ((0, 0), (1, 1), (1, 1)))        # (B,30,30)
    xf = jnp.pad(xp.reshape(B, M), ((0, 0), (0, 2 * Wp + 2)))  # (B, M+62)
    # output position m = h*Wp + w needs tap (dh,dw) at xp row m+dh*Wp+dw
    taps = [xf[:, dh * Wp + dw: dh * Wp + dw + M]
            for dh in range(3) for dw in range(3)]
    P = jnp.stack(taps, 0).reshape(9, B * M)                  # (9, B*M)
    dyp = jnp.pad(dy, ((0, 0), (0, 2), (0, 2), (0, 0)))       # (B,30,30,O)
    dy2 = dyp.reshape(B * M, O)
    dw = jax.lax.dot_general(P, dy2, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dw.reshape(3, 3, 1, O)


def main():
    log(f"devices: {jax.devices()}  C={C} B={B}")
    kx, kw, kg = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (C, B, H, W, I), jnp.bfloat16)
    w = jax.random.normal(kw, (C, 3, 3, I, O), jnp.bfloat16) * 0.3
    dy = jax.random.normal(kg, (C, B, H, W, O), jnp.bfloat16)

    # correctness on one client vs autodiff wgrad
    def loss(w1):
        return jnp.sum(lax_conv(x[0], w1).astype(jnp.float32)
                       * dy[0].astype(jnp.float32))

    ref = jax.grad(loss)(w[0])
    got = wgrad_patchT(x[0], dy[0])
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    log(f"correctness: max abs err {err:.3e} (scale {scale:.1f})")

    # XLA autodiff wgrad baseline (vmapped per-client)
    def full_loss(x, w, dy):
        y = jax.vmap(lax_conv)(x, w)
        return jnp.sum(y.astype(jnp.float32) * dy.astype(jnp.float32))

    base = jax.jit(jax.grad(full_loss, argnums=1))
    ms, cs = timeit(base, x, w, dy)
    log(f"xla grouped wgrad      : {ms:8.2f} ms (compile {cs:.0f}s)")

    cand = jax.jit(jax.vmap(wgrad_patchT))
    ms, cs = timeit(cand, x, dy)
    log(f"patchT lane-major wgrad: {ms:8.2f} ms (compile {cs:.0f}s)")


if __name__ == "__main__":
    main()
