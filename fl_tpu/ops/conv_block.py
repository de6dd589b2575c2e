"""Fused Pallas conv-stack kernels for SimpleCNN — the round-4 perf kernel.

Replaces the whole convolutional segment of the flagship model
(conv3x3(1→32) → relu → maxpool2 → conv3x3(32→64) → relu → maxpool2,
reference src/shared/models_pytorch.py:82-97) with TWO pipelined Pallas
kernels — one forward, one backward — gridded over (client ×) batch
chunks. Motivation (round-3/4 xplane profiles, docs/performance.md): at
C=512 clients the per-client-weights conv stack costs ~34 ms of the
58 ms step — conv2 dgrad/fwd/wgrad run ~5× off the HBM roofline on
XLA's grouped-conv lowering, the two maxpool backwards are
select-and-scatter at roofline (beatable only by FUSION, not by a better
pool kernel), and ~10 ms of layout copies reconcile the conv kernels
with the elementwise chain. Round 2/3 measured 11 formulation
alternatives; the tap-loop Pallas kernels lost because K=32/64 GEMMs
fill ≤12.5% of the MXU. These kernels fix both failure modes at once:

- **MXU shape**: every conv is ONE implicit-GEMM per grid cell with the
  9 taps packed into K (K = 36 / 288 / 576), built as nine static
  sublane-offset slices of a halo-padded flat-row buffer in VMEM
  (the collapse trick of fl_tpu.ops.conv_pallas, which see).
- **Zero intermediate HBM traffic**: the stem runs in space-to-depth
  form (28×28×1 image → 14×14×4, conv1 → 14×14×128 where the 4
  output-channel groups are the pool parities — conv_pallas.s2d_stem_weights),
  so relu+maxpool1 collapse to a lane-group max and the 28×28
  activation plane never exists. Forward residuals are just x2
  (pool1 output) and a2 (conv2 relu output), stored in flat-row form;
  the backward recomputes y1 from the image (cheap: K=36 GEMM),
  routes pool gradients by recomputed argmax (first-match tie-break,
  matching select-and-scatter — see fl_tpu.ops.pool_vjp), and emits
  ONLY the four weight/bias gradients: the image gradient is dead, so
  dx never hits HBM at all.
- **Pipelining**: grid over batch chunks (× clients via vmap's
  leading grid dim) with per-chunk BlockSpecs, so Mosaic
  double-buffers HBM↔VMEM copies across cells — the round-1 grid-free
  kernels had no overlap and lost 3-10×.

Weight-gradient accumulation across batch chunks uses the
revisited-output-block pattern (out index_map constant in the chunk
axis; initialized at chunk 0).

Numerics: all GEMMs accumulate in f32 on the MXU (preferred_element_type);
biases are added in f32 before the relu (the standard flax path adds a
bf16-cast bias — differences are sub-ulp-of-bf16). Pool tie-breaking is
first-match in row-major window order, identical to XLA's
select-and-scatter (tests/test_conv_block.py asserts both against the
standard flax stack).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fl_tpu.ops.conv_pallas import _interpret, s2d_stem_weights


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _geometry(H: int):
    """Flat-row geometry for the H×H post-stem plane (H=14 for MNIST)."""
    Wp = _round_up(H + 2, 8)
    Hp = Wp  # square padded plane keeps row arithmetic uniform
    shifts = tuple(dh * Wp + dw for dh in range(3) for dw in range(3))
    smax = 2 * Wp + 2
    return Hp, Wp, shifts, smax


def _row_valid_mask(M: int, Bc: int, Hp: int, Wp: int, H: int, W: int):
    """(M, 1) f32 mask of rows (b, h, w) with h<H and w<W (conv-output
    rows; the rest of the padded plane is wraparound garbage)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    h = (r // Wp) % Hp
    w = r % Wp
    return ((h < H) & (w < W)).astype(jnp.float32)


def _patches(patch_ref, src, shifts, ci, M):
    """patch_ref[:, k*ci:(k+1)*ci] = src[s_k : s_k+M] for each tap; returns
    the assembled (M, 9*ci) value. src (a VMEM value) carries enough halo
    that every static slice is in bounds."""
    for k, s in enumerate(shifts):
        patch_ref[:, k * ci:(k + 1) * ci] = src[s:s + M, :]
    return patch_ref[:, : 9 * ci]


def _pool_argmax_first(w00, w01, w10, w11):
    """Max of a 2×2 window plus first-match one-hot routing masks, in
    row-major window order — the select-and-scatter tie-break."""
    m = jnp.maximum(jnp.maximum(w00, w01), jnp.maximum(w10, w11))
    e00 = w00 == m
    e01 = (w01 == m) & ~e00
    e10 = (w10 == m) & ~e00 & ~e01
    e11 = (w11 == m) & ~e00 & ~e01 & ~e10
    return m, (e00, e01, e10, e11)


def _up(x, s):
    """Row-shift: out[r] = x[r + s] (zero fill) on a 2D (R, C) value.
    Mosaic-friendly (pad + contiguous slice; no gather, no roll)."""
    return jnp.pad(x, ((0, s), (0, 0)))[s:]


def _compact(x, dims, ph, pw):
    """Rows of the (M, C) flat plane at parity (h%2==ph, w%2==pw), as a
    (Bc, Hp/2, Wp/2, C) block — strided-slice-free (parity reshapes; every
    reshape keeps C as the minor axis, the only shape casts Mosaic's
    layout inference accepts)."""
    Bc, Hp, Wp, C = dims
    M = Bc * Hp * Wp
    t = x.reshape(M // 2, 2, C)[:, pw:pw + 1, :].reshape(M // 2, C)
    t = t.reshape(Bc * Hp // 2, 2, Wp // 2, C)[:, ph:ph + 1, :, :]
    return t.reshape(Bc, Hp // 2, Wp // 2, C)


def _scatter_pool_cotangent(g, Hp, Wp):
    """XLA-side: place g (B, Ho, Wo, C) at the window-base rows (2i, 2j)
    of a zero (B*Hp*Wp, C) flat plane — rank-changing interleaves live
    OUTSIDE the kernel (Mosaic's layout inference rejects them)."""
    B, Ho, Wo, C = g.shape
    gz = g[:, :, None, :, None, :]
    gz = jnp.pad(gz, ((0, 0), (0, 0), (0, 1), (0, 0), (0, 1), (0, 0)))
    gz = gz.reshape(B, 2 * Ho, 2 * Wo, C)
    gz = jnp.pad(gz, ((0, 0), (0, Hp - 2 * Ho), (0, Wp - 2 * Wo), (0, 0)))
    return gz.reshape(B * Hp * Wp, C)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(dims, xs_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                pooled_ref, x2_ref, a2_ref, patch):
    Bc, H, W, C1, C2, Hp, Wp, shifts, smax = dims
    M = Bc * Hp * Wp
    f32 = jnp.float32
    cdt = xs_ref.dtype

    # --- stem: conv1 in s2d form + relu + group-max (= maxpool1) ---------
    xs = xs_ref[:]                                     # (M, 4), collapsed
    xsh = jnp.pad(xs, ((0, smax), (0, 0)))
    p1 = _patches(patch, xsh, shifts, 4, M)            # (M, 36)
    y1 = jnp.dot(p1, w1_ref[:], preferred_element_type=f32) + b1_ref[:]
    # relu + cast to the compute dtype BEFORE the parity max, matching the
    # standard chain (a1 is a bf16 activation there, pooled in bf16)
    y1 = jnp.maximum(y1, 0.0).astype(cdt)              # (M, 4*C1)
    x2 = jnp.maximum(
        jnp.maximum(y1[:, 0 * C1:1 * C1], y1[:, 1 * C1:2 * C1]),
        jnp.maximum(y1[:, 2 * C1:3 * C1], y1[:, 3 * C1:4 * C1]))
    # zero the wraparound-garbage rows: they feed conv2's SAME padding
    valid = _row_valid_mask(M, Bc, Hp, Wp, H, W)
    x2 = x2 * valid.astype(cdt)                        # (M, C1)
    x2_ref[:] = x2

    # --- conv2 + bias + relu ---------------------------------------------
    # conv-output row r reads x2 rows r + s_k − (Wp+1); shift the halo
    x2h = jnp.pad(x2, ((Wp + 1, smax - Wp - 1), (0, 0)))
    p2 = _patches(patch, x2h, shifts, C1, M)           # (M, 9*C1)
    y2 = jnp.dot(p2, w2_ref[:], preferred_element_type=f32) + b2_ref[:]
    a2 = jnp.maximum(y2, 0.0).astype(cdt)              # (M, C2)
    a2_ref[:] = a2

    # --- maxpool2 over the valid H×W region ------------------------------
    # window max lands at the window's base row (even h, even w); compact
    # the base-row lattice with parity reshapes (no strided slices)
    Ho, Wo = H // 2, W // 2
    m0 = jnp.maximum(a2, _up(a2, 1))
    m1 = jnp.maximum(m0, _up(m0, Wp))
    pooled = _compact(m1, (Bc, Hp, Wp, C2), 0, 0)[:, :Ho, :Wo, :]
    pooled_ref[:] = pooled


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(dims, g_ref, xs_ref, x2_ref, a2_ref, w1_ref, b1_ref,
                w2f_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, patch):
    Bc, H, W, C1, C2, Hp, Wp, shifts, smax = dims
    M = Bc * Hp * Wp
    f32 = jnp.float32
    cdt = xs_ref.dtype
    first = pl.program_id(0) == 0

    def _down(x, s):  # row r <- x[r - s] (zero fill)
        return jnp.pad(x, ((s, 0), (0, 0)))[:M]

    def _spread(t, up1=False, upw=False):
        """From one window-position lattice to all four rows of each
        window: a w-shift then an h-shift (each zero-filled, 2D only)."""
        t = (t + _up(t, 1)) if up1 else (t + _down(t, 1))
        return (t + _up(t, Wp)) if upw else (t + _down(t, Wp))

    # --- pool2 backward + relu2 mask (full-plane 2D formulation) ----------
    # g arrives pre-scattered onto the window-base lattice (XLA side).
    a2 = a2_ref[:]                                     # (M, C2)
    g_sc = g_ref[:]                                    # (M, C2), base rows
    r = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    hpar, wpar = (r // Wp) % 2, r % 2
    one, zero = jnp.ones((), cdt), jnp.zeros((), cdt)
    m00 = jnp.where((hpar == 0) & (wpar == 0), one, zero)
    m01 = jnp.where((hpar == 0) & (wpar == 1), one, zero)
    m10 = jnp.where((hpar == 1) & (wpar == 0), one, zero)
    m11 = jnp.where((hpar == 1) & (wpar == 1), one, zero)
    # window max at base rows, then spread to every member row
    m0 = jnp.maximum(a2, _up(a2, 1))
    m1 = jnp.maximum(m0, _up(m0, Wp))
    m_at = _spread(m1 * m00)
    g_at = _spread(g_sc)
    # first-match tie-break: a row takes the gradient iff it equals the
    # window max and no earlier row (row-major window order) does
    eq = jnp.where(a2 == m_at, one, zero)
    f00 = _spread(eq * m00)                       # e(0,0) seen from anywhere
    f01 = _spread(eq * m01, up1=True)             # e(0,1): w-shift is UP
    f10 = _spread(eq * m10, upw=True)             # e(1,0): h-shift is UP
    allow = (m00 + m01 * (one - f00)
             + m10 * (one - f00) * (one - f01)
             + m11 * (one - f00) * (one - f01) * (one - f10))
    valid = _row_valid_mask(M, Bc, Hp, Wp, H, W).astype(cdt)
    relu = jnp.where(a2 > 0, one, zero)
    dz2 = g_at * eq * allow * relu * valid             # (M, C2) cdt
    db2 = jnp.sum(dz2.astype(f32), axis=0, keepdims=True)  # (1, C2)

    # --- conv2 wgrad: patches(x2)^T @ dz2 ---------------------------------
    x2 = x2_ref[:]
    x2h = jnp.pad(x2, ((Wp + 1, smax - Wp - 1), (0, 0)))
    p2 = _patches(patch, x2h, shifts, C1, M).astype(cdt)
    dw2 = jax.lax.dot_general(p2, dz2.astype(cdt), (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)  # (9*C1, C2)

    # --- conv2 dgrad: patches'(dz2) @ w2_flipped --------------------------
    # dx2[r] = Σ_k dz2[r − s_k + Wp+1]; buffer front-pad smax−(Wp+1)… use
    # symmetric smax so slice k starts at smax − s_k + (Wp+1) − (Wp+1)
    dzh = jnp.pad(dz2.astype(cdt), ((smax - Wp - 1, Wp + 1), (0, 0)))
    gp = _patches(patch, dzh, tuple(smax - Wp - 1 + Wp + 1 - s
                                    for s in shifts), C2, M)
    dx2 = jnp.dot(gp, w2f_ref[:], preferred_element_type=f32)  # (M, C1)
    valid = _row_valid_mask(M, Bc, Hp, Wp, H, W)
    dx2 = dx2 * valid                                  # kill wraparound rows

    # --- stem backward: recompute y1, route by group argmax --------------
    xs = xs_ref[:]
    xsh = jnp.pad(xs, ((0, smax), (0, 0)))
    p1 = _patches(patch, xsh, shifts, 4, M).astype(cdt)
    y1 = jnp.dot(p1, w1_ref[:], preferred_element_type=f32) + b1_ref[:]
    y1 = jnp.maximum(y1, 0.0).astype(cdt)  # same cast point as forward
    g0, g1 = y1[:, 0 * C1:1 * C1], y1[:, 1 * C1:2 * C1]
    g2, g3 = y1[:, 2 * C1:3 * C1], y1[:, 3 * C1:4 * C1]
    _, (f0, f1, f2, f3) = _pool_argmax_first(g0, g1, g2, g3)
    dz1 = jnp.concatenate(
        [dx2 * f0 * (g0 > 0), dx2 * f1 * (g1 > 0),
         dx2 * f2 * (g2 > 0), dx2 * f3 * (g3 > 0)], axis=1)  # (M, 4*C1) f32
    db1 = jnp.sum(dz1, axis=0, keepdims=True)
    dw1 = jax.lax.dot_general(p1, dz1.astype(cdt), (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)  # (36, 4*C1)

    # --- accumulate across batch chunks ----------------------------------
    @pl.when(first)
    def _():
        dw1_ref[:] = dw1
        db1_ref[:] = db1
        dw2_ref[:] = dw2
        db2_ref[:] = db2

    @pl.when(jnp.logical_not(first))
    def _():
        dw1_ref[:] += dw1
        db1_ref[:] += db1
        dw2_ref[:] += dw2
        db2_ref[:] += db2


# ---------------------------------------------------------------------------
# host-side drivers (per client; vmap adds the client grid dim)
# ---------------------------------------------------------------------------

def _pick_bc(B: int, dtype) -> int:
    """Batch-chunk size: VMEM per cell grows ~linearly in Bc (the patch
    scratch is (Bc·Hp·Wp, 576)); 8 fits comfortably in bf16, 4 in f32."""
    target = 8 if jnp.dtype(dtype).itemsize <= 2 else 4
    for bc in (target, 4, 2, 1):
        if B % bc == 0 and bc <= B:
            return bc
    return 1


def _collapse_s2d(x_img: jax.Array, Hp: int, Wp: int) -> jax.Array:
    """(B, 2H, 2W, 1) image → collapsed s2d rows (B*Hp*Wp, 4) with the
    SAME-pad start offset baked in (row (b,hp,wp) = xs2d[hp−1, wp−1])."""
    B, H2, W2, _ = x_img.shape
    H, W = H2 // 2, W2 // 2
    xs = x_img.reshape(B, H, 2, W, 2).transpose(0, 1, 3, 2, 4)
    xs = xs.reshape(B, H, W, 4)
    xs = jnp.pad(xs, ((0, 0), (1, Hp - H - 1), (1, Wp - W - 1), (0, 0)))
    return xs.reshape(B * Hp * Wp, 4)


def _fwd_call(x_img, w1s, b1s, w2m, b2m):
    """Per-client fused forward. Returns (pooled (B,Ho,Wo,C2), x2 rows,
    a2 rows)."""
    B = x_img.shape[0]
    H = x_img.shape[1] // 2
    W = x_img.shape[2] // 2
    C1 = w1s.shape[1] // 4
    C2 = w2m.shape[1]
    Hp, Wp, shifts, smax = _geometry(H)
    cdt = w2m.dtype
    Bc = _pick_bc(B, cdt)
    nc = B // Bc
    M = Bc * Hp * Wp
    Ho, Wo = H // 2, W // 2
    dims = (Bc, H, W, C1, C2, Hp, Wp, shifts, smax)

    xs = _collapse_s2d(x_img.astype(cdt), Hp, Wp)      # (B*Hp*Wp, 4)
    kern = functools.partial(_fwd_kernel, dims)
    pooled, x2, a2 = pl.pallas_call(
        kern,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((M, 4), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((36, 4 * C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C1, C2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Bc, Ho, Wo, C2), lambda j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, C1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, C2), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Ho, Wo, C2), cdt),
            jax.ShapeDtypeStruct((B * Hp * Wp, C1), cdt),
            jax.ShapeDtypeStruct((B * Hp * Wp, C2), cdt),
        ),
        scratch_shapes=[pltpu.VMEM((M, max(36, 9 * C1)), cdt)],
        interpret=_interpret(),
    )(xs, w1s.astype(cdt), b1s.astype(jnp.float32).reshape(1, -1),
      w2m.astype(cdt), b2m.astype(jnp.float32).reshape(1, -1))
    return pooled, x2, a2


def _bwd_call(g, x_img, x2, a2, w1s, b1s, w2m):
    """Per-client fused backward. Returns (dw1s (36,4C1), db1s (4C1,),
    dw2 (9C1,C2), db2 (C2,)) in f32."""
    B = x_img.shape[0]
    H = x_img.shape[1] // 2
    W = x_img.shape[2] // 2
    C1 = w1s.shape[1] // 4
    C2 = w2m.shape[1]
    Hp, Wp, shifts, smax = _geometry(H)
    cdt = w2m.dtype
    Bc = _pick_bc(B, cdt)
    nc = B // Bc
    M = Bc * Hp * Wp
    Ho, Wo = H // 2, W // 2
    dims = (Bc, H, W, C1, C2, Hp, Wp, shifts, smax)

    xs = _collapse_s2d(x_img.astype(cdt), Hp, Wp)
    # dgrad weight: wd[k', co, ci] with flipped taps — dx2[r, ci] =
    # Σ_{k, co} dz2[r − s_k + Wp+1, co] · w2[k, ci, co]; the patch at
    # column block k' holds dz2[r + (Wp+1) − s_{k'}], i.e. tap k' = k,
    # so wd2[k·C2:(k+1)·C2, :] = w2[k]^T
    w2f = (w2m.reshape(9, C1, C2).transpose(0, 2, 1)
           .reshape(9 * C2, C1).astype(cdt))
    kern = functools.partial(_bwd_kernel, dims)
    dw1, db1, dw2, db2 = pl.pallas_call(
        kern,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((M, C2), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 4), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, C1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, C2), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((36, 4 * C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C2, C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((36, 4 * C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C1, C2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((36, 4 * C1), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * C1), jnp.float32),
            jax.ShapeDtypeStruct((9 * C1, C2), jnp.float32),
            jax.ShapeDtypeStruct((1, C2), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((M, 9 * C2), cdt)],
        interpret=_interpret(),
    )(_scatter_pool_cotangent(g.astype(cdt), Hp, Wp), xs, x2, a2,
      w1s.astype(cdt),
      b1s.astype(jnp.float32).reshape(1, -1), w2f)
    return dw1, db1.reshape(-1), dw2, db2.reshape(-1)


# ---------------------------------------------------------------------------
# weight lifts and their adjoints (host/XLA side, tiny tensors)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _s2d_lift_matrix(C1: int) -> np.ndarray:
    """L (9*C1, 36*4*C1) f32 with s2d_w_flat = w_flat @ L — the linear map
    of conv_pallas.s2d_stem_weights as an explicit matrix, so the VJP of
    the lift is a GEMM with L^T."""
    L = np.zeros((9 * C1, 36 * 4 * C1), np.float32)
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
                                for o in range(C1):
                                    src = (dh * 3 + dw) * C1 + o
                                    dst = ((th * 3 + tw) * 4
                                           + (ch * 2 + cw)) * 4 * C1 \
                                        + g * C1 + o
                                    L[src, dst] = 1.0
    return L


def lift_stem(w1: jax.Array, b1: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(3,3,1,C1) stem weights → s2d GEMM form (36, 4*C1); bias tiled over
    the 4 parity groups."""
    C1 = w1.shape[-1]
    L = jnp.asarray(_s2d_lift_matrix(C1))
    w1s = (w1.reshape(1, 9 * C1) @ L).reshape(36, 4 * C1)
    return w1s, jnp.tile(b1, 4)


def unlift_stem_grads(dw1s: jax.Array, db1s: jax.Array, C1: int):
    """Adjoint of lift_stem: s2d-space grads → (3,3,1,C1) + (C1,)."""
    L = jnp.asarray(_s2d_lift_matrix(C1))
    dw1 = (dw1s.reshape(1, 36 * 4 * C1) @ L.T).reshape(3, 3, 1, C1)
    db1 = db1s.reshape(4, C1).sum(0)
    return dw1, db1


# ---------------------------------------------------------------------------
# the public op
# ---------------------------------------------------------------------------

@jax.custom_vjp
def conv_stack(x_img: jax.Array, w1: jax.Array, b1: jax.Array,
               w2: jax.Array, b2: jax.Array) -> jax.Array:
    """maxpool2(relu(conv2(maxpool2(relu(conv1(x)+b1)))+b2)) for a
    1-channel even-sized image, as one fused Pallas program.

    x_img (B, 2H, 2W, 1), w1 (3,3,1,C1), w2 (3,3,C1,C2) → (B, H/2, W/2, C2).
    The VJP returns zero image gradient (the FL trainers never use it)."""
    w1s, b1s = lift_stem(w1, b1)
    pooled, _, _ = _fwd_call(x_img, w1s, b1s,
                             w2.reshape(-1, w2.shape[-1]), b2)
    return pooled


def _stack_fwd(x_img, w1, b1, w2, b2):
    w1s, b1s = lift_stem(w1, b1)
    w2m = w2.reshape(-1, w2.shape[-1])
    pooled, x2, a2 = _fwd_call(x_img, w1s, b1s, w2m, b2)
    return pooled, (x_img, x2, a2, w1s, b1s, w2m)


def _stack_bwd(res, g):
    x_img, x2, a2, w1s, b1s, w2m = res
    C1 = w1s.shape[1] // 4
    C2 = w2m.shape[1]
    dw1s, db1s, dw2m, db2 = _bwd_call(g, x_img, x2, a2, w1s, b1s, w2m)
    dw1, db1 = unlift_stem_grads(dw1s, db1s, C1)
    dw2 = dw2m.reshape(3, 3, C1, C2)
    return (jnp.zeros_like(x_img), dw1.astype(jnp.float32),
            db1.astype(jnp.float32), dw2.astype(jnp.float32),
            db2.astype(jnp.float32))


conv_stack.defvjp(_stack_fwd, _stack_bwd)
