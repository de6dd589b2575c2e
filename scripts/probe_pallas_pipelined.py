"""Probe: properly PIPELINED Pallas conv2 formulations (grid over clients).

The round-1 Pallas kernel was grid-free (whole client in VMEM, batched by
vmap) — no DMA/compute overlap, measured 3-10x slower than XLA. This probe
uses an explicit grid=(C,) with per-client BlockSpecs so Pallas
double-buffers client blocks across cells, and measures:

  1. vmapped lax.conv fwd        (XLA baseline, ~9 ms known)
  2. pallas batched GEMM         (prebuilt patches; isolates GEMM+cell rate)
  3. pallas tap-loop conv fwd    (9 accumulated K=32 GEMMs, no patch matrix)

conv2 shapes: C=512 clients, B=32, 14x14, 32->64, bf16.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from _bench_util import lax_conv3x3 as lax_conv, log, timeit  # noqa: E402

C = int(os.environ.get("BENCH_C", "512"))
B, H, W, I, O = 32, 14, 14, 32, 64
Hp, Wp = H + 2, W + 2  # 16x16 padded grid
M = B * Hp * Wp        # 8192 rows/client (incl. pad rows)
HALO = 2 * Wp + 2      # max tap offset


# --- 2. pure batched GEMM: (C, M, K) @ (C, K, N), grid=(C,) ---------------

def _gemm_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def pallas_batched_gemm(a, b):
    Cc, Mm, Kk = a.shape
    Nn = b.shape[-1]
    return pl.pallas_call(
        _gemm_kernel,
        grid=(Cc,),
        in_specs=[
            pl.BlockSpec((None, Mm, Kk), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Kk, Nn), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, Mm, Nn), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cc, Mm, Nn), a.dtype),
    )(a, b)


# --- 3. tap-loop conv fwd: x flat rows + 9 accumulated GEMMs ---------------

def _taploop_kernel(offsets, x_ref, w_ref, o_ref, acc):
    acc[:] = jnp.zeros_like(acc)
    for k, off in enumerate(offsets):
        acc[:] += jax.lax.dot(
            x_ref[pl.ds(off, M), :], w_ref[k],
            preferred_element_type=jnp.float32)
    o_ref[:] = acc[:].astype(o_ref.dtype)


def pallas_taploop_conv(x, w):
    """x (C,B,H,W,I), w (C,3,3,I,O) -> (C,B,H,W,O)."""
    Cc = x.shape[0]
    offsets = [dh * Wp + dw for dh in range(3) for dw in range(3)]
    # collapse to halo'd flat rows: xp[hp, wp] = x[hp-1, wp-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    xf = xp.reshape(Cc, M, I)
    xf = jnp.pad(xf, ((0, 0), (0, HALO), (0, 0)))
    w2 = w.reshape(Cc, 9, I, O)
    kernel = functools.partial(_taploop_kernel, offsets)
    y = pl.pallas_call(
        kernel,
        grid=(Cc,),
        in_specs=[
            pl.BlockSpec((None, M + HALO, I), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 9, I, O), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, M, O), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cc, M, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, O), jnp.float32)],
    )(xf, w2)
    # rows m = b*256 + (h+1)*16 + (w+1) hold output position (b,h,w)
    y = y.reshape(Cc, B, Hp, Wp, O)[:, :, 1:H + 1, 1:W + 1, :]
    return y


def main():
    log(f"devices: {jax.devices()}  C={C} B={B} conv2 {H}x{W} {I}->{O}")
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (C, B, H, W, I), jnp.bfloat16)
    w = jax.random.normal(kw, (C, 3, 3, I, O), jnp.bfloat16) * 0.1

    # correctness of tap-loop vs lax.conv (one client)
    y_ref = lax_conv(x[0], w[0])
    y_got = pallas_taploop_conv(x[:2], w[:2])[0]
    err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)
                                - y_got.astype(jnp.float32))))
    log(f"tap-loop correctness: max abs err {err:.3e}")

    ms, cs = timeit(jax.jit(jax.vmap(lax_conv)), x, w)
    log(f"1. xla lax.conv fwd     : {ms:8.2f} ms (compile {cs:.0f}s)")

    ka, kb = jax.random.split(jax.random.PRNGKey(1))
    a = jax.random.normal(ka, (C, M, 9 * I), jnp.bfloat16)
    b = jax.random.normal(kb, (C, 9 * I, O), jnp.bfloat16)
    try:
        ms, cs = timeit(jax.jit(pallas_batched_gemm), a, b)
        gf = 2 * C * M * 9 * I * O / 1e9
        log(f"2. pallas batched GEMM  : {ms:8.2f} ms (compile {cs:.0f}s) "
            f"= {gf / ms:.1f} TFLOP/s")
    except Exception as e:
        log(f"2. pallas batched GEMM  : FAILED {type(e).__name__}: {str(e)[:300]}")

    try:
        ms, cs = timeit(jax.jit(pallas_taploop_conv), x, w)
        log(f"3. pallas tap-loop fwd  : {ms:8.2f} ms (compile {cs:.0f}s)")
    except Exception as e:
        log(f"3. pallas tap-loop fwd  : FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
