"""Pallas implicit-GEMM 3x3 conv — the round-2 performance kernel.

Problem (docs/performance.md): the bench vmaps local SGD over C=512 clients
with per-client conv weights. XLA lowers the doubly-vmapped conv to a
grouped conv whose backward dominates the step (the conv1 wgrad alone is
~26 ms of the 85 ms step at C=512). An XLA-level shift-GEMM rewrite is
HBM-bound (measured 4x slower than lax.conv forward: nine accumulator
round-trips through HBM). The fix keeps the patch matrix in VMEM — an
implicit-GEMM Pallas kernel.

Layout trick that makes the kernel trivial: pad each image spatially for
SAME *and* to a sublane-aligned width Wp (a multiple of 16), then collapse
(B, Hp, Wp, I) -> (B*Hp*Wp, I) rows. In that 2D view, the patch row of
output position r for kernel tap (dh, dw) is simply row r + dh*Wp + dw.
With a zero halo of `smax` rows on both ends of the collapsed array, a full
patch matrix (rows, 9*I) is nine *static slices* of the same VMEM-resident
block — no gathers, no reshapes, no wraparound — followed by ONE MXU GEMM
with K = 9*I:

    forward:  y2  = patches(X2)  @ w2            w2  = w.reshape(9I, O)
    wgrad  :  dW2 = patches(X2)^T @ dy2          (contract over rows)
    dgrad  :  dX2 = patches'(dy2) @ wd2          wd2 = w^T per tap,
                                                 negative shifts

The Wp > W+2 padding columns only pollute rows whose output is sliced away
(h >= H, w >= W) or whose cotangent is zero-padded, so no masking is needed.
The kernel body is grid-free (whole client in VMEM); `jax.vmap` prepends
grid dims for the client axis (and for batch chunks when a client's
buffers exceed VMEM), which is exactly Pallas's supported batching path.
dgrad and wgrad are separate pallas_calls so XLA DCE can drop an unused
dgrad (e.g. the first conv layer, whose input grad is dead).

All GEMMs accumulate in f32 on the MXU. Numerics are asserted against
`lax.conv_general_dilated` in tests/test_ops.py (interpret mode on CPU).

This replaces the compute of the reference's hot training loop
(src/shared/training.py:184-207) for the conv layers of the model zoo
(src/shared/models_pytorch.py:59-165) with a TPU-native kernel.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANE = 16          # sublane tile (bf16); also divides f32's 8
LANE = 128
# budget for in-kernel buffers; VMEM is ~16MB/core, leave room for
# pipeline copies of the vmap-blocked inputs
VMEM_BUDGET = 10 * 1024 * 1024


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _lane_bytes(rows: int, cols: int, itemsize: int) -> int:
    return rows * _round_up(cols, LANE) * itemsize


def _pick_chunk(B: int, rows_per_b: int, cols_list: Sequence[int],
                itemsize: int = 2) -> int:
    """Largest divisor Bc of B whose per-chunk buffers fit VMEM_BUDGET."""
    for bc in range(B, 0, -1):
        if B % bc:
            continue
        total = sum(_lane_bytes(bc * rows_per_b, c, itemsize)
                    for c in cols_list)
        if total <= VMEM_BUDGET:
            return bc
    return 1


def _patch_kernel(offsets, out_dtype, contract_rows, a_ref, b_ref, o_ref,
                  patches):
    """patches[:, k*ci:(k+1)*ci] = a[off_k : off_k + M]  (a carries a zero
    halo so every slice is in bounds), then one MXU GEMM:
    o = patches @ b, or o = patches^T @ b when contract_rows."""
    M, kcols = patches.shape
    ci = kcols // len(offsets)
    for k, off in enumerate(offsets):
        patches[:, k * ci:(k + 1) * ci] = a_ref[pl.ds(off, M), :]
    if contract_rows:
        o_ref[:] = jax.lax.dot_general(
            patches[:], b_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)
    else:
        o_ref[:] = jnp.dot(
            patches[:], b_ref[:], preferred_element_type=jnp.float32
        ).astype(out_dtype)


def _patch_gemm(a2: jax.Array, b2: jax.Array, shifts: Sequence[int],
                out_cols: int, out_dtype, contract_rows: bool = False,
                smax: int | None = None) -> jax.Array:
    """Grid-free whole-block driver.

    a2 (M, ci) is halo-padded to (M + 2*smax, ci); patch column block k is
    rows [smax + shifts[k], smax + shifts[k] + M). b2 is the (9ci, co)
    weight [contract_rows=False] or the (M, co) cotangent
    [contract_rows=True; output (9ci, co) f32].
    """
    M, ci = a2.shape
    if smax is None:
        smax = max(abs(s) for s in shifts)
    ah = jnp.pad(a2, ((smax, smax), (0, 0)))
    offsets = [smax + s for s in shifts]
    kcols = len(shifts) * ci
    out_shape = jax.ShapeDtypeStruct(
        (kcols, out_cols) if contract_rows else (M, out_cols), out_dtype)
    kernel = functools.partial(_patch_kernel, offsets, out_dtype,
                               contract_rows)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((M, kcols), a2.dtype)],
        interpret=_interpret(),
    )(ah, b2)


def _geom(H: int, W: int):
    Hp = H + 2
    Wp = _round_up(W + 2, SUBLANE)
    shifts = [dh * Wp + dw for dh in range(3) for dw in range(3)]
    return Hp, Wp, shifts


def _collapse(x: jax.Array, Hp: int, Wp: int) -> jax.Array:
    """Input view: xp[hp, wp] = x[hp-1, wp-1] (SAME pad at the start)."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, Hp - H - 1), (1, Wp - W - 1), (0, 0)))
    return xp.reshape(B * Hp * Wp, C)


def _collapse_end(g: jax.Array, Hp: int, Wp: int) -> jax.Array:
    """Cotangent view: G2[h*Wp + w] = g[h, w] — outputs live at rows
    h*Wp + w (no start offset), so g pads at the END only."""
    B, H, W, C = g.shape
    gp = jnp.pad(g, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    return gp.reshape(B * Hp * Wp, C)


def _chunked(fn, x: jax.Array, bc: int):
    """Run a per-(Bc,H,W,C) function over B in chunks via vmap (Pallas's
    supported batching path: the chunk axis becomes a leading grid dim)."""
    B = x.shape[0]
    if bc == B:
        return fn(x)
    xs = x.reshape((B // bc, bc) + x.shape[1:])
    return jax.vmap(fn)(xs)


@jax.custom_vjp
def conv3x3_pallas(x: jax.Array, w: jax.Array) -> jax.Array:
    """3x3 stride-1 SAME conv: x (B,H,W,I), w (3,3,I,O) -> (B,H,W,O)."""
    return _pallas_fwd_impl(x, w)


def _pallas_fwd_impl(x: jax.Array, w: jax.Array) -> jax.Array:
    B, H, W, I = x.shape
    O = w.shape[-1]
    Hp, Wp, shifts = _geom(H, W)
    w2 = w.reshape(9 * I, O).astype(x.dtype)
    bc = _pick_chunk(B, Hp * Wp, [I, 9 * I, O], x.dtype.itemsize)

    def one_chunk(xc):
        x2 = _collapse(xc, Hp, Wp)
        y2 = _patch_gemm(x2, w2, shifts, O, x.dtype)
        return y2.reshape(bc, Hp, Wp, O)[:, :H, :W, :]

    y = _chunked(one_chunk, x, bc)
    return y.reshape(B, H, W, O)


def _pallas_fwd_rule(x, w):
    return _pallas_fwd_impl(x, w), (x, w)


def _pallas_bwd_rule(res, g):
    x, w = res
    B, H, W, I = x.shape
    O = w.shape[-1]
    Hp, Wp, shifts = _geom(H, W)
    g = g.astype(x.dtype)

    # wgrad: dW2 (9I, O) = patches(X2)^T @ dy2, contracting all rows
    bc_w = _pick_chunk(B, Hp * Wp, [I, 9 * I, O], x.dtype.itemsize)

    def wgrad_chunk(args):
        xc, gc = args
        return _patch_gemm(_collapse(xc, Hp, Wp), _collapse_end(gc, Hp, Wp),
                           shifts, O, jnp.float32, contract_rows=True)

    if bc_w == B:
        dw2 = wgrad_chunk((x, g))
    else:
        xs = x.reshape((B // bc_w, bc_w) + x.shape[1:])
        gs = g.reshape((B // bc_w, bc_w) + g.shape[1:])
        dw2 = jax.vmap(wgrad_chunk)((xs, gs)).sum(0)
    dw = dw2.reshape(3, 3, I, O).astype(w.dtype)

    # dgrad: dX2[r] = sum_k dy2[r - s_k] @ w[k]^T  (negative shifts)
    wd2 = jnp.transpose(w, (0, 1, 3, 2)).reshape(9 * O, I).astype(x.dtype)
    bc_d = _pick_chunk(B, Hp * Wp, [O, 9 * O, I], x.dtype.itemsize)
    neg_shifts = [-s for s in shifts]

    def dgrad_chunk(gc):
        g2 = _collapse_end(gc, Hp, Wp)
        dx2 = _patch_gemm(g2, wd2, neg_shifts, I, x.dtype)
        return dx2.reshape(bc_d, Hp, Wp, I)[:, 1:H + 1, 1:W + 1, :]

    dx = _chunked(dgrad_chunk, g, bc_d).reshape(B, H, W, I)
    return dx, dw


conv3x3_pallas.defvjp(_pallas_fwd_rule, _pallas_bwd_rule)


# ---------------------------------------------------------------------------
# Space-to-depth stem: conv3x3(1->O) + relu + maxpool2x2, MXU-shaped.
#
# A 3x3 conv on a 1-channel image is hopeless on the MXU (K=9, N=32 —
# mostly padding lanes), and XLA's grouped-conv wgrad for it dominates the
# round budget (~26 of 85 ms at C=512). Trick: view the 28x28 image as
# 14x14x4 (2x2 blocks as channels). The stride-1 3x3 conv becomes a 3x3
# conv with I=4, O=4*32=128 (each output channel-group (a, b) holds the
# conv outputs at pixel parity (a, b)) — dense MXU shapes, served by the
# same conv3x3_pallas kernel. The model's 2x2/2 maxpool then reduces
# exactly over the parity groups, so relu+pool collapse to a lane-group max
# and no depth-to-space transpose is ever materialized. The stem input grad
# is dead (first layer), and its dgrad pallas_call is DCE'd.
# ---------------------------------------------------------------------------

def space_to_depth2(x: jax.Array) -> jax.Array:
    """(B, 2H, 2W, 1) -> (B, H, W, 4); channel = ch*2 + cw parity."""
    B, H2, W2, _ = x.shape
    x = x.reshape(B, H2 // 2, 2, W2 // 2, 2)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(B, H2 // 2, W2 // 2, 4)


def s2d_stem_weights(w: jax.Array) -> jax.Array:
    """Lift w (3,3,1,O) to the s2d kernel (3,3,4,4*O).

    Output channel (a*2+b)*O + o of the s2d conv equals the original conv
    output at pixel parity (a, b), channel o:
        w2[th, tw, ch*2+cw, (a*2+b)*O + o] = w[2*th+ch-a-1, 2*tw+cw-b-1, 0, o]
    (zero where the index falls outside the 3x3 kernel).
    """
    O = w.shape[-1]
    out = jnp.zeros((3, 3, 4, 4 * O), w.dtype)
    for th in range(3):
        for tw in range(3):
            for ch in range(2):
                for cw in range(2):
                    for a in range(2):
                        for b in range(2):
                            dh = 2 * th + ch - a - 1
                            dw = 2 * tw + cw - b - 1
                            if 0 <= dh <= 2 and 0 <= dw <= 2:
                                g = a * 2 + b
                                out = out.at[
                                    th, tw, ch * 2 + cw,
                                    g * O:(g + 1) * O,
                                ].set(w[dh, dw, 0, :])
    return out


def conv_stem_s2d(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """maxpool2x2(relu(conv3x3_same(x, w) + b)) for 1-channel even-sized x.

    x (B, 2H, 2W, 1), w (3,3,1,O), b (O,) -> (B, H, W, O).
    """
    O = w.shape[-1]
    xs = space_to_depth2(x)
    w2 = s2d_stem_weights(w)
    y = conv3x3_pallas(xs, w2) + jnp.tile(b, 4)
    B, H, W, _ = y.shape
    y = y.reshape(B, H, W, 4, O).max(axis=3)
    return jax.nn.relu(y)
