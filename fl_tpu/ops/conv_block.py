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
    rows; the rest of the padded plane is wraparound garbage). Built
    multiplicatively — Mosaic's layout inference rejects `and` on (M, 1)
    i1 vectors in mixed-dtype kernels."""
    r = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    h = (r // Wp) % Hp
    w = r % Wp
    hv = jnp.clip(H - h, 0, 1)
    wv = jnp.clip(W - w, 0, 1)
    return (hv * wv).astype(jnp.float32)


def _halo(ref, x, front, M):
    """Write x into the (M+smax, C) halo scratch at row `front`, zeroing
    the halo rows, and return the scratch value. One narrow copy per use —
    the round-4 probe measured the patch-materialization alternative
    (assemble (M, 9C) im2col in VMEM, one K=9C GEMM) at 29.5/83.7 ms vs
    XLA's 12.1/52.5 for the segment: the 9-wide scratch write+read is pure
    VPU traffic and dominates; the MXU is nowhere near the bottleneck at
    these shapes, so tap-accumulated GEMMs from a narrow halo buffer do
    strictly less data movement."""
    ref[:] = jnp.zeros_like(ref)
    ref[front:front + M, :] = x
    return ref[:]


def _upsample2x2(g8, Bc, Hp, Wp):
    """(Bc·(Hp/2)·(Wp/2), C) compact pool cotangent → (Bc·Hp·Wp, C) with
    every output row (b, h, w) holding g[b, h//2, w//2] — two
    duplicate-concat reshapes (rank-3, C-minor: the shape-op class
    Mosaic's layout inference accepts). Replaces reading a 4x-zeros
    scattered plane from HBM plus three shift-adds in VMEM."""
    n, C = g8.shape
    t = g8.reshape(n, 1, C)
    t = jnp.concatenate([t, t], axis=1).reshape(2 * n, C)    # w-dup
    t = t.reshape(Bc * (Hp // 2), Wp, C)
    t = jnp.concatenate([t, t], axis=1)                      # h-dup
    return t.reshape(Bc * Hp * Wp, C)


def _xs_to_halo(ref, xs, Bc, H, Wp):
    """Place compact s2d rows (Bc·H·H, S) onto the padded lattice inside
    the halo scratch, SAME-conv offset baked (data lands at (h+1, w+1) of
    each Wp×Wp image block): a middle-dim w-pad plus Bc static per-image
    copies (aligned: Wp + b·Wp² ≡ 0 mod 8). Replaces an XLA-side pad +
    relayout copy (~3 ms/step at bench shapes, round-4 profile)."""
    S = xs.shape[-1]
    m_img = Wp * Wp
    t = xs.reshape(Bc * H, H, S)
    t = jnp.pad(t, ((0, 0), (1, Wp - H - 1), (0, 0)))
    t = t.reshape(Bc, H * Wp, S)
    ref[:] = jnp.zeros_like(ref)
    for b in range(Bc):
        ref[Wp + b * m_img: Wp + b * m_img + H * Wp, :] = t[b]
    return ref[:]


def _preshift3(src):
    """Materialize the three dw-shifted views of a halo buffer ONCE.

    Every tap slice ``src[dh·Wp + dw : … + M]`` with dw ∈ {1, 2} is
    sublane-misaligned, and Mosaic lowers each such slice to a full-data
    rotate — the round-5 probes measured these rotates, not the GEMMs or
    the mask algebra, as the kernels' dominant cost (docs/performance.md
    round-5 kernel table). Pre-rotating one copy per dw makes all nine
    tap reads aligned (dh·Wp is a multiple of 8 for Wp = 16): one rotate
    per (buffer, dw) instead of one per (tap, consumer)."""
    return (src, _up(src, 1), _up(src, 2))


def _cat_patches_into_direct(ref, src, shifts, M, ci):
    """_cat_patches_into from ONE halo buffer via (misaligned) tap
    slices — round-5 follow-up: the pre-shifted copies were introduced
    when slice misalignment was the suspected cost; the packed-K result
    proved the kernels MXU-bound, so the three materialized copies per
    buffer are pure overhead. Reading the nine slices directly is
    value-identical."""
    for k, sft in enumerate(shifts):
        ref[:, k * ci:(k + 1) * ci] = src[sft:sft + M, :]
    return ref[:]


def _cat_patches_into(ref, srcs, Wp, M, ci):
    """Write the (M, 9·ci) im2col patch plane into a VMEM scratch from
    the three pre-shifted halo copies (column block k = tap k). A plain
    lane-axis jnp.concatenate of the nine slices does NOT lower (Mosaic:
    "result/input offset mismatch on non-concat dimension" — the parts
    carry different row offsets); routing through a scratch ref
    materializes each part at offset 0."""
    for k in range(9):
        dh, dw = divmod(k, 3)
        ref[:, k * ci:(k + 1) * ci] = srcs[dw][dh * Wp:dh * Wp + M, :]
    return ref[:]


def _stem_patches(x_img, Hp, Wp, cdt):
    """(B, 2H, 2W, P) images → (B·Hp·Wp, 36P) halo-padded s2d im2col
    patches, built XLA-SIDE. Tap k's columns are the s2d lattice view
    shifted by (dh−1, dw−1), zero outside — bit-equal to the kernels'
    halo-slice reads on every valid row (wraparound rows differ only
    where the kernels' valid masks already zero the contribution, and
    carry clean zeros here). Moving the stem's im2col out of the kernel
    turns its nine K=4P tap GEMMs (each paying the full 128-wide MXU)
    into ONE K=36P GEMM: 9× fewer effective MXU passes for S=8."""
    B, H2, W2, P = x_img.shape
    H, W = H2 // 2, W2 // 2
    xs = _collapse_s2d(x_img.astype(cdt)).reshape(B, H, W, 4 * P)
    t = jnp.pad(xs, ((0, 0), (1, Hp - H + 1), (1, Wp - W + 1), (0, 0)))
    views = [t[:, dh:dh + Hp, dw:dw + Wp, :]
             for dh in range(3) for dw in range(3)]
    return jnp.concatenate(views, axis=-1).reshape(B * Hp * Wp, 36 * P)


def _cat_patches(srcs, Wp, M):
    """(M, 9·C) im2col patch plane from the three pre-shifted halo copies
    — columns ordered (tap k, channel c), matching the (9·ci, co) weight
    layout. Round-5 rationale: a (M, ci≤64) tap GEMM pays the FULL
    128-wide systolic array regardless of K, so nine accumulated tap
    GEMMs cost ~9×/2× their real FLOPs in effective MXU passes (the
    round-5 probes measured the kernels MXU-bound at exactly that
    inflation: plane-op and slicing changes moved nothing). One GEMM
    with the taps packed into K collapses the padding waste: K=72→128
    for the stem (9×), K=576 for conv2 (2×). The lane-axis concat is a
    VMEM write of the patch plane (~2.4 GB/step at bench shapes, ~1 ms
    — far below the MXU passes it deletes)."""
    parts = []
    for k in range(9):
        dh, dw = divmod(k, 3)
        parts.append(srcs[dw][dh * Wp:dh * Wp + M, :])
    return jnp.concatenate(parts, axis=1)


def _conv_taps_pre(srcs, Wp, w_ref, ci, M, rev=False):
    """Σ_k src[s_k : s_k+M] @ w[k·ci:(k+1)·ci] over pre-shifted sources —
    implicit-GEMM conv as 9 accumulated MXU calls on ALIGNED slices.
    ``rev=True`` computes the flipped-tap (dgrad) orientation
    src[smax − s_k : …+M] via copy 2−dw at aligned base (2−dh)·Wp."""
    acc = None
    for k in range(9):
        dh, dw = divmod(k, 3)
        if rev:
            start, src = (2 - dh) * Wp, srcs[2 - dw]
        else:
            start, src = dh * Wp, srcs[dw]
        part = jnp.dot(src[start:start + M, :],
                       w_ref[k * ci:(k + 1) * ci, :],
                       preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def _wgrad_taps_pre(srcs, Wp, dz, ci, M):
    """Concatenated per-tap weight gradients over pre-shifted sources:
    rows k·ci:(k+1)·ci are src[s_k : …+M]^T @ dz — K = M on the MXU,
    aligned slices only (see _preshift3)."""
    parts = []
    for k in range(9):
        dh, dw = divmod(k, 3)
        parts.append(jax.lax.dot_general(
            srcs[dw][dh * Wp:dh * Wp + M, :], dz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    return jnp.concatenate(parts, axis=0)


def _conv_taps(src, shifts, w_ref, ci, M, base=0):
    """Σ_k src[base + s_k : …+M] @ w[k·ci:(k+1)·ci] — implicit-GEMM conv
    as 9 accumulated MXU calls on shifted slices of the halo buffer.
    (Misaligned-slice variant; the kernels use _conv_taps_pre — kept for
    the halo-offset cases the aligned form does not cover.)"""
    acc = None
    for k, s in enumerate(shifts):
        part = jnp.dot(src[base + s:base + s + M, :],
                       w_ref[k * ci:(k + 1) * ci, :],
                       preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def _wgrad_taps(src, shifts, dz, ci, M, base=0):
    """Concatenated per-tap weight gradients: rows k·ci:(k+1)·ci of the
    result are src[base+s_k : …+M]^T @ dz — K = M on the MXU (well
    filled; M ≥ 1024 at bench shapes)."""
    parts = [jax.lax.dot_general(
        src[base + s:base + s + M, :], dz, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) for s in shifts]
    return jnp.concatenate(parts, axis=0)


def _pool_argmax_first(w00, w01, w10, w11):
    """Max of a 2×2 window plus first-match one-hot routing masks (f32),
    in row-major window order — the select-and-scatter tie-break. All
    compares run in f32 (exact lift of bf16) and the masks are built
    arithmetically: Mosaic on v5e rejects sub-f32 vector compares and i1
    logical ops in mixed-dtype kernels."""
    f32 = jnp.float32
    a, b, c, d = (w.astype(f32) for w in (w00, w01, w10, w11))
    m = jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))
    one = jnp.ones((), f32)
    e00 = jnp.where(a == m, one, 0.0)
    e01 = jnp.where(b == m, one, 0.0) * (one - e00)
    e10 = jnp.where(c == m, one, 0.0) * (one - e00) * (one - e01)
    e11 = (jnp.where(d == m, one, 0.0)
           * (one - e00) * (one - e01) * (one - e10))
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


def _compact_pool_cotangent(g, Hp, Wp):
    """XLA-side: pad g (B, Ho, Wo, C) to the even (B, Hp/2, Wp/2, C) grid
    and flatten — the kernel upsamples it to the full lattice in VMEM
    (see _bwd_kernel), so the 4x-zeros scattered plane never exists in
    HBM (round-4 profile: the scatter pad + its relayout copy cost
    ~2.5 ms/step at bench shapes)."""
    B, Ho, Wo, C = g.shape
    gz = jnp.pad(g, ((0, 0), (0, Hp // 2 - Ho), (0, Wp // 2 - Wo), (0, 0)))
    return gz.reshape(B * (Hp // 2) * (Wp // 2), C)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(dims, xs_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                pooled_ref, xs_halo, x2_halo):
    Bc, H, W, C1, C2, Hp, Wp, shifts, smax = dims
    M = Bc * Hp * Wp
    f32 = jnp.float32
    cdt = xs_ref.dtype
    S = xs_ref.shape[-1]  # s2d input channels: 4 per packed client

    # --- stem: conv1 in s2d form + relu + group-max (= maxpool1) ---------
    xs3 = _preshift3(_xs_to_halo(xs_halo, xs_ref[:], Bc, H, Wp))
    y1 = _conv_taps_pre(xs3, Wp, w1_ref, S, M) + b1_ref[:]
    # relu + cast to the compute dtype BEFORE the parity max, matching the
    # standard chain (a1 is a bf16 activation there, pooled in bf16)
    y1 = jnp.maximum(y1, 0.0).astype(cdt)              # (M, 4*C1)
    x2 = jnp.maximum(
        jnp.maximum(y1[:, 0 * C1:1 * C1], y1[:, 1 * C1:2 * C1]),
        jnp.maximum(y1[:, 2 * C1:3 * C1], y1[:, 3 * C1:4 * C1]))
    # zero the wraparound-garbage rows: they feed conv2's SAME padding
    valid = _row_valid_mask(M, Bc, Hp, Wp, H, W)
    x2 = x2 * valid.astype(cdt)                        # (M, C1)

    # --- conv2 + bias + relu ---------------------------------------------
    # conv-output row r reads x2 rows r + s_k − (Wp+1); halo offset Wp+1
    x23 = _preshift3(_halo(x2_halo, x2, Wp + 1, M))    # (M+smax', C1) x3
    y2 = _conv_taps_pre(x23, Wp, w2_ref, C1, M) + b2_ref[:]
    a2 = jnp.maximum(y2, 0.0).astype(cdt)              # (M, C2)

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

def _bwd_kernel(dims, g_ref, xs_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                w2f_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                xs_halo, x2_halo, dz_halo):
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

    # --- RESIDUAL-FREE: recompute the forward chain from the image -------
    # The backward takes only (g, image, weights): y1/x2/a2 are recomputed
    # in VMEM (MXU-cheap tap GEMMs) instead of round-tripping ~1.5 GB/step
    # of activations through HBM. Casts match the forward's exactly, so
    # the pool/relu masks are bit-identical to the fwd's tie-breaks.
    S = xs_ref.shape[-1]
    xs3 = _preshift3(_xs_to_halo(xs_halo, xs_ref[:], Bc, H, Wp))
    y1 = _conv_taps_pre(xs3, Wp, w1_ref, S, M) + b1_ref[:]
    y1 = jnp.maximum(y1, 0.0).astype(cdt)  # same cast point as forward
    x2 = jnp.maximum(
        jnp.maximum(y1[:, 0 * C1:1 * C1], y1[:, 1 * C1:2 * C1]),
        jnp.maximum(y1[:, 2 * C1:3 * C1], y1[:, 3 * C1:4 * C1]))
    validc = _row_valid_mask(M, Bc, Hp, Wp, H, W).astype(cdt)
    x2 = x2 * validc                                   # (M, C1)
    x23 = _preshift3(_halo(x2_halo, x2, Wp + 1, M))    # reused by wgrad
    y2 = _conv_taps_pre(x23, Wp, w2_ref, C1, M) + b2_ref[:]
    a2 = jnp.maximum(y2, 0.0).astype(cdt).astype(f32)  # fwd's exact a2
    # g arrives COMPACT (Bc·Hp/2·Wp/2 rows); upsample to the full lattice
    g_at = _upsample2x2(g_ref[:].astype(f32), Bc, Hp, Wp)

    # --- pool2 backward + relu2 mask (full-plane 2D formulation) ----------
    # The ENTIRE mask algebra runs in f32: bf16 → f32 is an exact lift, so
    # equality semantics are unchanged, and it keeps every i1 compare
    # result in the f32-native (8,128) layout — Mosaic/v5e cannot relayout
    # an i1 vector into the 16-bit (16,128) tiling a bf16 select needs.
    r = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    # parity masks, multiplicatively (no i1 `and` — see _row_valid_mask)
    hp = ((r // Wp) % 2).astype(f32)
    wp = (r % 2).astype(f32)
    one = jnp.ones((), f32)
    zero = jnp.zeros((), f32)
    m00 = (one - hp) * (one - wp)
    m01 = (one - hp) * wp
    m10 = hp * (one - wp)
    m11 = hp * wp
    # window max at base rows, then spread to every member row
    m0 = jnp.maximum(a2, _up(a2, 1))
    m1 = jnp.maximum(m0, _up(m0, Wp))
    m_at = _spread(m1 * m00)
    # first-match tie-break: a row takes the gradient iff it equals the
    # window max and no earlier row (row-major window order) does
    eq = jnp.where(a2 == m_at, one, zero)
    f00 = _spread(eq * m00)                       # e(0,0) seen from anywhere
    f01 = _spread(eq * m01, up1=True)             # e(0,1): w-shift is UP
    f10 = _spread(eq * m10, upw=True)             # e(1,0): h-shift is UP
    allow = (m00 + m01 * (one - f00)
             + m10 * (one - f00) * (one - f01)
             + m11 * (one - f00) * (one - f01) * (one - f10))
    valid = _row_valid_mask(M, Bc, Hp, Wp, H, W)
    relu = jnp.where(a2 > 0.0, one, zero)
    dz2 = g_at * eq * allow * relu * valid             # (M, C2) f32
    db2 = jnp.sum(dz2, axis=0, keepdims=True)          # (1, C2)

    # --- conv2 wgrad: per-tap x2ᵀ @ dz2 (K = M on the MXU) ----------------
    dz2c = dz2.astype(cdt)
    dw2 = _wgrad_taps_pre(x23, Wp, dz2c, C1, M)        # (9*C1, C2)

    # --- conv2 dgrad: tap-accumulated dz2 @ w2_flipped --------------------
    # dx2[r] = Σ_k dz2[r − s_k + Wp+1] @ w2[k]ᵀ; with dz2 at halo offset
    # smax − (Wp+1), tap k reads smax − s_k — the rev=True aligned form
    dz3 = _preshift3(_halo(dz_halo, dz2c, smax - Wp - 1, M))
    dx2 = _conv_taps_pre(dz3, Wp, w2f_ref, C2, M,
                         rev=True)                 # (M, C1) f32
    valid = _row_valid_mask(M, Bc, Hp, Wp, H, W)
    dx2 = dx2 * valid                                  # kill wraparound rows

    # --- stem backward: route by group argmax of the recomputed y1 -------
    g0, g1 = y1[:, 0 * C1:1 * C1], y1[:, 1 * C1:2 * C1]
    g2, g3 = y1[:, 2 * C1:3 * C1], y1[:, 3 * C1:4 * C1]
    _, (f0, f1, f2, f3) = _pool_argmax_first(g0, g1, g2, g3)

    def _pos(t):  # relu mask, f32 compare (see _pool_argmax_first)
        return jnp.where(t.astype(f32) > 0.0, 1.0, 0.0)

    dz1 = jnp.concatenate(
        [dx2 * f0 * _pos(g0), dx2 * f1 * _pos(g1),
         dx2 * f2 * _pos(g2), dx2 * f3 * _pos(g3)], axis=1)  # (M, 4*C1) f32
    db1 = jnp.sum(dz1, axis=0, keepdims=True)
    dw1 = _wgrad_taps_pre(xs3, Wp, dz1.astype(cdt), S, M)  # (9S, 4*C1)

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

def _pick_bc(B: int, dtype, bwd: bool = False, pack: int = 1) -> int:
    """Batch-chunk size: VMEM per cell grows ~linearly in Bc (the patch
    scratch is (Bc·Hp·Wp, 576)); 8 fits comfortably in bf16 forward. The
    backward carries ~a dozen live (M, C2) f32 mask/gradient temporaries
    (exact-compare algebra — see _bwd_kernel) and OOMs VMEM at Bc=8, so
    it runs half-size chunks (more grid cells = more pipelining, same
    total work)."""
    import os as _os

    # probed on v5e at bench shapes (pack=2, bf16): fwd 8 / bwd 4 beat the
    # halved-chunk variants (16.68/15.6 vs 17.0/16.6 ms) and fit VMEM now
    # that the backward is residual-free with narrow halo scratches; f32
    # compute halves the targets (doubled temp widths).
    target = (4 if bwd else 8) if jnp.dtype(dtype).itemsize <= 2 else \
        (2 if bwd else 4)
    if pack >= 4:
        # P=4 doubles every plane's lane width; halve the chunk to keep
        # the same VMEM footprint per cell
        target = max(target // 2, 1)
    ov = _os.environ.get("CONV_BLOCK_BC_BWD" if bwd else "CONV_BLOCK_BC_FWD")
    if ov:
        target = int(ov)
    for bc in (target, 4, 2, 1):
        if B % bc == 0 and bc <= target and bc <= B:
            return bc
    return 1


def _collapse_s2d(x_img: jax.Array) -> jax.Array:
    """(B, 2H, 2W, P) image stack → COMPACT s2d rows (B*H*W, 4P); the
    kernels place them onto the padded lattice in VMEM (_xs_to_halo), so
    no XLA-side pad/relayout of the plane exists. P > 1 is the
    client-packed case: channel order is client-outer, pool-parity-inner
    — matching the packed stem weight rows."""
    B, H2, W2, P = x_img.shape
    H, W = H2 // 2, W2 // 2
    xs = x_img.reshape(B, H, 2, W, 2, P).transpose(0, 1, 3, 5, 2, 4)
    return xs.reshape(B * H * W, 4 * P)


def _fwd_call_impl(x_img, w1s, b1s, w2m, b2m):
    """Per-client fused forward. Returns (pooled (B,Ho,Wo,C2), x2 rows,
    a2 rows)."""
    B = x_img.shape[0]
    H = x_img.shape[1] // 2
    W = x_img.shape[2] // 2
    C1 = w1s.shape[1] // 4
    C2 = w2m.shape[1]
    Hp, Wp, shifts, smax = _geometry(H)
    cdt = w2m.dtype
    Bc = _pick_bc(B, cdt, pack=x_img.shape[-1])
    nc = B // Bc
    M = Bc * Hp * Wp
    Ho, Wo = H // 2, W // 2
    dims = (Bc, H, W, C1, C2, Hp, Wp, shifts, smax)

    xs = _collapse_s2d(x_img.astype(cdt))              # (B*H*W, S)
    S = xs.shape[-1]
    kern = functools.partial(_fwd_kernel, dims)
    pooled = pl.pallas_call(
        kern,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((Bc * H * W, S), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * S, 4 * C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C1, C2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bc, Ho, Wo, C2), lambda j: (j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, C2), cdt),
        scratch_shapes=[pltpu.VMEM((M + smax, S), cdt),
                        pltpu.VMEM((M + smax, C1), cdt)],
        interpret=_interpret(),
    )(xs, w1s.astype(cdt), b1s.astype(jnp.float32).reshape(1, -1),
      w2m.astype(cdt), b2m.astype(jnp.float32).reshape(1, -1))
    return pooled


def _bwd_call_impl(g, x_img, w1s, b1s, w2m, b2m):
    """Per-client (or packed-pair) fused backward — RESIDUAL-FREE: takes
    only (cotangent, image, weights); y1/x2/a2 are recomputed in VMEM
    (see _bwd_kernel). Returns (dw1s (9S,4C1), db1s (4C1,),
    dw2 (9C1,C2), db2 (C2,)) in f32."""
    B = x_img.shape[0]
    H = x_img.shape[1] // 2
    W = x_img.shape[2] // 2
    C1 = w1s.shape[1] // 4
    C2 = w2m.shape[1]
    Hp, Wp, shifts, smax = _geometry(H)
    cdt = w2m.dtype
    Bc = _pick_bc(B, cdt, bwd=True, pack=x_img.shape[-1])
    nc = B // Bc
    M = Bc * Hp * Wp
    Ho, Wo = H // 2, W // 2
    dims = (Bc, H, W, C1, C2, Hp, Wp, shifts, smax)

    xs = _collapse_s2d(x_img.astype(cdt))
    S = xs.shape[-1]
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
            pl.BlockSpec((Bc * (Hp // 2) * (Wp // 2), C2), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bc * H * W, S), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * S, 4 * C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C1, C2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C2, C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((9 * S, 4 * C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C1, C2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((9 * S, 4 * C1), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * C1), jnp.float32),
            jax.ShapeDtypeStruct((9 * C1, C2), jnp.float32),
            jax.ShapeDtypeStruct((1, C2), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((M + smax, S), cdt),
                        pltpu.VMEM((M + smax, C1), cdt),
                        pltpu.VMEM((M + smax, C2), cdt)],
        interpret=_interpret(),
    )(_compact_pool_cotangent(g.astype(cdt), Hp, Wp), xs,
      w1s.astype(cdt), b1s.astype(jnp.float32).reshape(1, -1),
      w2m.astype(cdt), b2m.astype(jnp.float32).reshape(1, -1), w2f)
    return dw1, db1.reshape(-1), dw2, db2.reshape(-1)


# ---------------------------------------------------------------------------
# residual variant: the forward stores the pool2 first-match window index
# ---------------------------------------------------------------------------
#
# Round-5: the backward kernel's 25.2 ms self-time (the bisection table in
# docs/performance.md — the round-4 "11.9 ms" was a DCE artifact) is
# dominated by the conv2 forward recompute and the ~15 full-plane mask ops
# of the first-match pool2 routing. Both are REPLACEABLE by one tiny
# residual: the fwd computes the 2x2 window argmax on the four parity
# sub-lattices (compact quarter planes — no spreads needed) and stores the
# routing index (values 0..3, one per pooled position; ~134 MB/step at
# bench shapes vs the ~1.5 GB/step x2/a2 would cost). relu2' folds into
# the cotangent OUTSIDE the kernel as g * (pooled > 0): the routed window
# position has a2 == pooled exactly. The stem recompute stays — the pool1
# routing needs y1 anyway, and x2 (conv2 wgrad's input) falls out of it
# for free.

def _fwd_kernel_res(dims, xsp_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    pooled_ref, idx_ref, x2_halo, x2p_scr):
    Bc, H, W, C1, C2, Hp, Wp, shifts, smax = dims
    M = Bc * Hp * Wp
    cdt = xsp_ref.dtype

    # stem: ONE K=9S GEMM over the XLA-built im2col patches
    y1 = jnp.dot(xsp_ref[:], w1_ref[:],
                 preferred_element_type=jnp.float32) + b1_ref[:]
    y1 = jnp.maximum(y1, 0.0).astype(cdt)
    x2 = jnp.maximum(
        jnp.maximum(y1[:, 0 * C1:1 * C1], y1[:, 1 * C1:2 * C1]),
        jnp.maximum(y1[:, 2 * C1:3 * C1], y1[:, 3 * C1:4 * C1]))
    valid = _row_valid_mask(M, Bc, Hp, Wp, H, W)
    x2 = x2 * valid.astype(cdt)
    x2p = _cat_patches_into_direct(
        x2p_scr, _halo(x2_halo, x2, Wp + 1, M), shifts, M, C1)
    y2 = jnp.dot(x2p, w2_ref[:],
                 preferred_element_type=jnp.float32) + b2_ref[:]
    a2 = jnp.maximum(y2, 0.0).astype(cdt)

    # maxpool2 + first-match argmax on the four parity sub-lattices:
    # window member (dh, dw) of the window at (2hh, 2ww) is exactly the
    # (dh, dw) parity compact — quarter-size planes, so the routing
    # algebra costs ~1/4 of the backward's old full-plane formulation
    # and needs no spread shifts at all
    qd = (Bc, Hp, Wp, C2)
    R = Bc * (Hp // 2) * (Wp // 2)
    a00 = _compact(a2, qd, 0, 0).reshape(R, C2)
    a01 = _compact(a2, qd, 0, 1).reshape(R, C2)
    a10 = _compact(a2, qd, 1, 0).reshape(R, C2)
    a11 = _compact(a2, qd, 1, 1).reshape(R, C2)
    m, (e00, e01, e10, e11) = _pool_argmax_first(a00, a01, a10, a11)
    del e00  # index 0 is the all-zeros encoding
    idx_ref[:] = (e01 + 2.0 * e10 + 3.0 * e11).astype(cdt)
    Ho, Wo = H // 2, W // 2
    pooled_ref[:] = m.astype(cdt).reshape(
        Bc, Hp // 2, Wp // 2, C2)[:, :Ho, :Wo, :]


def _bwd_kernel_res(dims, g_ref, idx_ref, xsp_ref, w1_ref, b1_ref,
                    w2f_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                    x2_halo, dz_halo, x2p_scr):
    """Backward with the stored pool2 routing index: no conv2 forward
    recompute, no full-plane tie-break algebra. g arrives already
    multiplied by relu2' (= pooled > 0) — see conv_stack_res."""
    Bc, H, W, C1, C2, Hp, Wp, shifts, smax = dims
    M = Bc * Hp * Wp
    f32 = jnp.float32
    cdt = xsp_ref.dtype
    first = pl.program_id(0) == 0

    # --- stem recompute (needed for pool1 routing; x2 falls out) --------
    y1 = jnp.dot(xsp_ref[:], w1_ref[:],
                 preferred_element_type=jnp.float32) + b1_ref[:]
    y1 = jnp.maximum(y1, 0.0).astype(cdt)
    x2 = jnp.maximum(
        jnp.maximum(y1[:, 0 * C1:1 * C1], y1[:, 1 * C1:2 * C1]),
        jnp.maximum(y1[:, 2 * C1:3 * C1], y1[:, 3 * C1:4 * C1]))
    valid = _row_valid_mask(M, Bc, Hp, Wp, H, W)
    x2 = x2 * valid.astype(cdt)
    x2p = _cat_patches_into_direct(
        x2p_scr, _halo(x2_halo, x2, Wp + 1, M), shifts, M, C1)

    # --- pool2 backward: route by the stored first-match index ----------
    g_at = _upsample2x2(g_ref[:].astype(f32), Bc, Hp, Wp)
    idx_at = _upsample2x2(idx_ref[:].astype(f32), Bc, Hp, Wp)
    r = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    pos = (2 * ((r // Wp) % 2) + (r % 2)).astype(f32)   # (M, 1) in 0..3
    one = jnp.ones((), f32)
    take = jnp.where(idx_at == pos, one, 0.0)
    dz2 = g_at * take * valid                            # (M, C2) f32
    db2 = jnp.sum(dz2, axis=0, keepdims=True)

    # --- conv2 wgrad / dgrad (same as the residual-free kernel) ---------
    dz2c = dz2.astype(cdt)
    dw2 = jax.lax.dot_general(x2p, dz2c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dzh = _halo(dz_halo, dz2c, smax - Wp - 1, M)
    dx2 = _conv_taps(dzh, tuple(smax - sft for sft in shifts),
                     w2f_ref, C2, M)
    dx2 = dx2 * valid

    # --- stem backward: route by group argmax of the recomputed y1 ------
    g0, g1 = y1[:, 0 * C1:1 * C1], y1[:, 1 * C1:2 * C1]
    g2, g3 = y1[:, 2 * C1:3 * C1], y1[:, 3 * C1:4 * C1]
    _, (f0, f1, f2, f3) = _pool_argmax_first(g0, g1, g2, g3)
    # relu1' folds into dx2 ONCE: the selected group's pre-pool value at
    # this lattice position IS x2 (the group max), so relu'(y1_sel) =
    # (x2 > 0) — one mask instead of four per-group ones. Exact: f_k = 0
    # wherever group k is not selected.
    dx2 = dx2 * jnp.where(x2.astype(f32) > 0.0, 1.0, 0.0)
    dz1 = jnp.concatenate(
        [dx2 * f0, dx2 * f1, dx2 * f2, dx2 * f3], axis=1)
    db1 = jnp.sum(dz1, axis=0, keepdims=True)
    dw1 = jax.lax.dot_general(xsp_ref[:], dz1.astype(cdt),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)

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


def _fwd_call_impl_res(x_img, w1s, b1s, w2m, b2m):
    """Residual-variant forward: returns (pooled, idx) where idx is the
    compact (B·(Hp/2)·(Wp/2), C2) first-match window index in {0..3}."""
    B = x_img.shape[0]
    H = x_img.shape[1] // 2
    W = x_img.shape[2] // 2
    C1 = w1s.shape[1] // 4
    C2 = w2m.shape[1]
    Hp, Wp, shifts, smax = _geometry(H)
    cdt = w2m.dtype
    Bc = _pick_bc(B, cdt, pack=x_img.shape[-1])
    nc = B // Bc
    M = Bc * Hp * Wp
    Ho, Wo = H // 2, W // 2
    dims = (Bc, H, W, C1, C2, Hp, Wp, shifts, smax)

    xsp = _stem_patches(x_img, Hp, Wp, cdt)            # (B*Hp*Wp, 9S)
    S = xsp.shape[-1] // 9
    kern = functools.partial(_fwd_kernel_res, dims)
    pooled, idx = pl.pallas_call(
        kern,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((M, 9 * S), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * S, 4 * C1), lambda j: (0, 0),
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
            pl.BlockSpec((Bc * (Hp // 2) * (Wp // 2), C2),
                         lambda j: (j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Ho, Wo, C2), cdt),
            jax.ShapeDtypeStruct((B * (Hp // 2) * (Wp // 2), C2), cdt),
        ),
        scratch_shapes=[pltpu.VMEM((M + smax, C1), cdt),
                        pltpu.VMEM((M, 9 * C1), cdt)],
        interpret=_interpret(),
    )(xsp, w1s.astype(cdt), b1s.astype(jnp.float32).reshape(1, -1),
      w2m.astype(cdt), b2m.astype(jnp.float32).reshape(1, -1))
    return pooled, idx


def _bwd_call_impl_res(g, idx, x_img, w1s, b1s, w2m):
    """Residual-variant backward. ``g`` must already carry relu2'
    (multiplied by ``pooled > 0`` — conv_stack_res does this)."""
    B = x_img.shape[0]
    H = x_img.shape[1] // 2
    W = x_img.shape[2] // 2
    C1 = w1s.shape[1] // 4
    C2 = w2m.shape[1]
    Hp, Wp, shifts, smax = _geometry(H)
    cdt = w2m.dtype
    Bc = _pick_bc(B, cdt, bwd=True, pack=x_img.shape[-1])
    nc = B // Bc
    M = Bc * Hp * Wp
    dims = (Bc, H, W, C1, C2, Hp, Wp, shifts, smax)

    xsp = _stem_patches(x_img, Hp, Wp, cdt)            # (B*Hp*Wp, 9S)
    S = xsp.shape[-1] // 9
    w2f = (w2m.reshape(9, C1, C2).transpose(0, 2, 1)
           .reshape(9 * C2, C1).astype(cdt))
    R = Bc * (Hp // 2) * (Wp // 2)
    kern = functools.partial(_bwd_kernel_res, dims)
    dw1, db1, dw2, db2 = pl.pallas_call(
        kern,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((R, C2), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, C2), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 9 * S), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * S, 4 * C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C2, C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((9 * S, 4 * C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * C1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C1, C2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((9 * S, 4 * C1), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * C1), jnp.float32),
            jax.ShapeDtypeStruct((9 * C1, C2), jnp.float32),
            jax.ShapeDtypeStruct((1, C2), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((M + smax, C1), cdt),
                        pltpu.VMEM((M + smax, C2), cdt),
                        pltpu.VMEM((M, 9 * C1), cdt)],
        interpret=_interpret(),
    )(_compact_pool_cotangent(g.astype(cdt), Hp, Wp), idx, xsp,
      w1s.astype(cdt), b1s.astype(jnp.float32).reshape(1, -1), w2f)
    return dw1, db1.reshape(-1), dw2, db2.reshape(-1)


# ---------------------------------------------------------------------------
# pair-packing vmap rules: vmap over clients takes the lane-packed path
# ---------------------------------------------------------------------------
#
# The round-4 probe (scripts/probe_conv_block.py, v5e, C=512 B=32 bf16)
# measured the per-client kernels LOSING to XLA (26.6/77.2 vs 12.1/52.5 ms
# for the segment) with the budget dominated by lane-underfilled VPU work,
# and the 2-client channel-packed kernels WINNING (44.6 vs 52.5 ms
# fwd+bwd): x2 pairs fill 64 lanes, a2/dz2 pairs fill all 128, halving
# the vreg count of every mask/pool/copy op, while the convs become
# block-diagonal pair GEMMs (2x MAC waste on an MXU that is <5% of the
# budget). These custom_vmap rules make plain `jax.vmap(conv_stack)` over
# an even client axis take that packed path automatically — the engine's
# superstep needs no pairing logic. The backward being RESIDUAL-FREE is
# what makes this exact: fwd and bwd calls pair independently, so no
# packed activation ever crosses the call boundary (and ~1.5 GB/step of
# x2/a2 HBM round-trips disappear outright).

from jax.custom_batching import custom_vmap  # noqa: E402


def _bcast_unbatched(axis_size, in_batched, args):
    return tuple(
        a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
        for a, b in zip(args, in_batched))


def _pack_width(axis_size, x_img):
    """Clients packed per kernel instance: 2 when the axis allows, else 0
    (per-client fallback). P=4 was MEASURED WORSE at bench shapes (32.2
    vs 29.2 ms segment fwd+bwd): filling the 128 lanes for x2/dx2 and
    the dgrad's N dimension does not pay for the 4× block-diagonal MAC
    waste on the now-larger packed GEMMs plus the halved batch chunks —
    round-5 table in docs/performance.md. FL_CONV_PACK=2|4 overrides
    for A/B probes."""
    import os as _os

    if x_img.shape[-1] != 1:
        return 0
    want = int(_os.environ.get("FL_CONV_PACK", "2"))
    for P in (want, 4, 2):
        if P in (2, 4) and axis_size % P == 0:
            return P
    return 0


def _pair_lifted(x_img, w1s, b1s, w2m, b2m, P=2):
    """Group P consecutive clients of lifted per-client args into the
    channel-packed forms (client-inner on rows/channels, group-outer on
    stem columns — the layout the kernels' slices assume)."""
    C = x_img.shape[0]
    n = C // P
    C1 = w1s.shape[-1] // 4
    C2 = w2m.shape[-1]
    xp = jnp.moveaxis(
        x_img.reshape((n, P) + x_img.shape[1:])[..., 0], 1, -1)
    t1 = w1s.reshape(n, P, 9, 4, 4, C1)
    w1p = jnp.einsum("npkigo,pq->nkpigqo", t1,
                     jnp.eye(P, dtype=w1s.dtype)) \
        .reshape(n, 36 * P, 4 * P * C1)
    b1p = b1s.reshape(n, P, 4, C1).transpose(0, 2, 1, 3) \
        .reshape(n, 4 * P * C1)
    # NB: the pack must preserve w2m's dtype exactly — the kernels take
    # their compute dtype from it (an f32 eye here silently promoted the
    # whole segment to f32 and broke the bf16 model's fc1 dtype chain)
    t2 = w2m.reshape(n, P, 9, C1, C2)
    w2p = jnp.einsum("npkio,pq->nkpiqo", t2,
                     jnp.eye(P, dtype=w2m.dtype)) \
        .reshape(n, 9 * P * C1, P * C2)
    b2p = b2m.reshape(n, P * C2)
    return xp, w1p, b1p, w2p, b2p, n, C1, C2


_fwd_call = custom_vmap(_fwd_call_impl)


@_fwd_call.def_vmap
def _fwd_vmap_rule(axis_size, in_batched, x_img, w1s, b1s, w2m, b2m):
    x_img, w1s, b1s, w2m, b2m = _bcast_unbatched(
        axis_size, in_batched, (x_img, w1s, b1s, w2m, b2m))
    if axis_size % 2 or x_img.shape[-1] != 1:
        return jax.vmap(_fwd_call_impl)(x_img, w1s, b1s, w2m, b2m), True
    xp, w1p, b1p, w2p, b2p, n, C1, C2 = _pair_lifted(
        x_img, w1s, b1s, w2m, b2m)
    pooled = jax.vmap(_fwd_call_impl)(xp, w1p, b1p, w2p, b2p)
    B, Ho, Wo = pooled.shape[1:4]
    out = pooled.reshape(n, B, Ho, Wo, 2, C2)
    out = jnp.moveaxis(out, 4, 1).reshape(axis_size, B, Ho, Wo, C2)
    return out, True


_bwd_call = custom_vmap(_bwd_call_impl)


@_bwd_call.def_vmap
def _bwd_vmap_rule(axis_size, in_batched, g, x_img, w1s, b1s, w2m, b2m):
    g, x_img, w1s, b1s, w2m, b2m = _bcast_unbatched(
        axis_size, in_batched, (g, x_img, w1s, b1s, w2m, b2m))
    if axis_size % 2 or x_img.shape[-1] != 1:
        outs = jax.vmap(_bwd_call_impl)(g, x_img, w1s, b1s, w2m, b2m)
        return outs, (True, True, True, True)
    xp, w1p, b1p, w2p, b2p, n, C1, C2 = _pair_lifted(
        x_img, w1s, b1s, w2m, b2m)
    B, Ho, Wo = g.shape[1:4]
    gp = jnp.moveaxis(g.reshape(n, 2, B, Ho, Wo, C2), 1, 4)         .reshape(n, B, Ho, Wo, 2 * C2)
    dw1p, db1p, dw2p, db2p = jax.vmap(_bwd_call_impl)(
        gp, xp, w1p, b1p, w2p, b2p)
    eye = jnp.eye(2, dtype=dw1p.dtype)
    dw1 = jnp.einsum("nkpigqo,pq->npkigo",
                     dw1p.reshape(n, 9, 2, 4, 4, 2, C1), eye)         .reshape(axis_size, 36, 4 * C1)
    db1 = db1p.reshape(n, 4, 2, C1).transpose(0, 2, 1, 3)         .reshape(axis_size, 4 * C1)
    dw2 = jnp.einsum("nkpiqo,pq->npkio",
                     dw2p.reshape(n, 9, 2, C1, 2, C2), eye)         .reshape(axis_size, 9 * C1, C2)
    db2 = db2p.reshape(axis_size, C2)
    return (dw1, db1, dw2, db2), (True, True, True, True)


_fwd_call_res = custom_vmap(_fwd_call_impl_res)


@_fwd_call_res.def_vmap
def _fwd_res_vmap_rule(axis_size, in_batched, x_img, w1s, b1s, w2m, b2m):
    x_img, w1s, b1s, w2m, b2m = _bcast_unbatched(
        axis_size, in_batched, (x_img, w1s, b1s, w2m, b2m))
    P = _pack_width(axis_size, x_img)
    if not P:
        outs = jax.vmap(_fwd_call_impl_res)(x_img, w1s, b1s, w2m, b2m)
        return outs, (True, True)
    xp, w1p, b1p, w2p, b2p, n, C1, C2 = _pair_lifted(
        x_img, w1s, b1s, w2m, b2m, P)
    pooled, idx = jax.vmap(_fwd_call_impl_res)(xp, w1p, b1p, w2p, b2p)
    B, Ho, Wo = pooled.shape[1:4]
    out = pooled.reshape(n, B, Ho, Wo, P, C2)
    out = jnp.moveaxis(out, 4, 1).reshape(axis_size, B, Ho, Wo, C2)
    R = idx.shape[1]
    idx = jnp.moveaxis(idx.reshape(n, R, P, C2), 2, 1) \
        .reshape(axis_size, R, C2)
    return (out, idx), (True, True)


_bwd_call_res = custom_vmap(_bwd_call_impl_res)


@_bwd_call_res.def_vmap
def _bwd_res_vmap_rule(axis_size, in_batched, g, idx, x_img, w1s, b1s, w2m):
    g, idx, x_img, w1s, b1s, w2m = _bcast_unbatched(
        axis_size, in_batched, (g, idx, x_img, w1s, b1s, w2m))
    P = _pack_width(axis_size, x_img)
    if not P:
        outs = jax.vmap(_bwd_call_impl_res)(g, idx, x_img, w1s, b1s, w2m)
        return outs, (True, True, True, True)
    C2 = w2m.shape[-1]
    xp, w1p, b1p, w2p, _unused_b2p, n, C1, C2 = _pair_lifted(
        x_img, w1s, b1s, w2m, jnp.zeros((axis_size, C2), w2m.dtype), P)
    B, Ho, Wo = g.shape[1:4]
    gp = jnp.moveaxis(g.reshape(n, P, B, Ho, Wo, C2), 1, 4) \
        .reshape(n, B, Ho, Wo, P * C2)
    R = idx.shape[1]
    idxp = jnp.moveaxis(idx.reshape(n, P, R, C2), 1, 2) \
        .reshape(n, R, P * C2)
    dw1p, db1p, dw2p, db2p = jax.vmap(_bwd_call_impl_res)(
        gp, idxp, xp, w1p, b1p, w2p)
    eye = jnp.eye(P, dtype=dw1p.dtype)
    dw1 = jnp.einsum("nkpigqo,pq->npkigo",
                     dw1p.reshape(n, 9, P, 4, 4, P, C1), eye) \
        .reshape(axis_size, 36, 4 * C1)
    db1 = db1p.reshape(n, 4, P, C1).transpose(0, 2, 1, 3) \
        .reshape(axis_size, 4 * C1)
    dw2 = jnp.einsum("nkpiqo,pq->npkio",
                     dw2p.reshape(n, 9, P, C1, P, C2), eye) \
        .reshape(axis_size, 9 * C1, C2)
    db2 = db2p.reshape(axis_size, C2)
    return (dw1, db1, dw2, db2), (True, True, True, True)


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
    pooled = _fwd_call(x_img, w1s, b1s,
                       w2.reshape(-1, w2.shape[-1]), b2)
    return pooled


def _stack_fwd(x_img, w1, b1, w2, b2):
    w1s, b1s = lift_stem(w1, b1)
    w2m = w2.reshape(-1, w2.shape[-1])
    pooled = _fwd_call(x_img, w1s, b1s, w2m, b2)
    # residual-free: the backward recomputes y1/x2/a2 from the image
    return pooled, (x_img, w1s, b1s, w2m, b2)


def _stack_bwd(res, g):
    x_img, w1s, b1s, w2m, b2 = res
    C1 = w1s.shape[1] // 4
    C2 = w2m.shape[1]
    dw1s, db1s, dw2m, db2 = _bwd_call(g, x_img, w1s, b1s, w2m, b2)
    dw1, db1 = unlift_stem_grads(dw1s, db1s, C1)
    dw2 = dw2m.reshape(3, 3, C1, C2)
    return (jnp.zeros_like(x_img), dw1.astype(jnp.float32),
            db1.astype(jnp.float32), dw2.astype(jnp.float32),
            db2.astype(jnp.float32))


conv_stack.defvjp(_stack_fwd, _stack_bwd)


@jax.custom_vjp
def conv_stack_res(x_img: jax.Array, w1: jax.Array, b1: jax.Array,
                   w2: jax.Array, b2: jax.Array) -> jax.Array:
    """conv_stack with a stored pool2 routing-index residual (round-5).

    Numerically equivalent to conv_stack — same f32-accumulated math and
    the same first-match pool tie-break, but the convolutions pack the
    nine taps into the GEMM K dimension (stem im2col built XLA-side;
    conv2 patches in VMEM), so f32 accumulation ORDER differs: outputs
    can differ from conv_stack by a bf16 ulp (tests pin near-equality
    and exact self-consistency). Why: a (M, ci≤64) tap GEMM pays the
    full 128-wide MXU regardless of K — nine accumulated taps cost
    ~9×/2× their real FLOPs; packed-K collapses that (docs/performance.md
    round-5 kernel table). The backward consumes the fwd's compact
    window index instead of recomputing conv2 and the full-plane routing
    algebra, and relu2' is applied to the cotangent OUTSIDE the kernel
    as g * (pooled > 0) — the routed window position holds a2 == pooled
    exactly. VJP returns zero image gradient like conv_stack."""
    w1s, b1s = lift_stem(w1, b1)
    pooled, _ = _fwd_call_res(x_img, w1s, b1s,
                              w2.reshape(-1, w2.shape[-1]), b2)
    return pooled


def _stack_res_fwd(x_img, w1, b1, w2, b2):
    w1s, b1s = lift_stem(w1, b1)
    w2m = w2.reshape(-1, w2.shape[-1])
    pooled, idx = _fwd_call_res(x_img, w1s, b1s, w2m, b2)
    return pooled, (x_img, w1s, b1s, w2m, pooled, idx)


def _stack_res_bwd(res, g):
    x_img, w1s, b1s, w2m, pooled, idx = res
    C1 = w1s.shape[1] // 4
    C2 = w2m.shape[1]
    # relu2' at the routed position: a2 there equals the window max, so
    # (pooled > 0) is exactly relu'(y2) where the gradient lands
    g = g * (pooled > 0).astype(g.dtype)
    dw1s, db1s, dw2m, db2 = _bwd_call_res(g, idx, x_img, w1s, b1s, w2m)
    dw1, db1 = unlift_stem_grads(dw1s, db1s, C1)
    dw2 = dw2m.reshape(3, 3, C1, C2)
    return (jnp.zeros_like(x_img), dw1.astype(jnp.float32),
            db1.astype(jnp.float32), dw2.astype(jnp.float32),
            db2.astype(jnp.float32))


conv_stack_res.defvjp(_stack_res_fwd, _stack_res_bwd)


# ---------------------------------------------------------------------------
# client-packed variant: P clients' channel planes share the lane dimension
# ---------------------------------------------------------------------------
#
# Why: the round-4 probes measured BOTH per-client kernel formulations
# losing to XLA (module docstring table) with the budget dominated by
# lane-underfilled VPU work — every (rows, 32/64-channel) vector op uses
# a quarter/half of the 128 lanes. Packing P=2 clients client-outer on
# the channel axis makes x2 (M, 64) → (M, 128)-shaped per PAIR of
# clients, halving the vreg count of every elementwise/mask/pool op,
# while the convs become block-diagonal pair GEMMs on the MXU (2× MAC
# waste — irrelevant, the MXU is <5% of the budget here). The kernels
# above are reused verbatim: they are fully shape-parameterized, and the
# packed weight lifts order columns GROUP-OUTER, CLIENT-INNER so the
# in-kernel 4-way parity max and pool routing slices stay correct.

def _eye_pack(t: jax.Array, P: int) -> jax.Array:
    """Block-diagonalize a per-client (P, 9, ci, co) tap stack into
    (9·P·ci, P·co): rows (k, c, i), cols (q, o), zero off the c==q
    diagonal."""
    _, _, ci, co = t.shape
    packed = jnp.einsum("pkio,pq->kpiqo", t, jnp.eye(P, dtype=t.dtype))
    return packed.reshape(9 * P * ci, P * co)


def _eye_unpack(g: jax.Array, P: int, ci: int, co: int) -> jax.Array:
    """Adjoint of _eye_pack: extract the diagonal blocks of a packed
    (9·P·ci, P·co) gradient → (P, 9, ci, co). Off-diagonal blocks are
    cross-client wgrad garbage (computed but never used)."""
    g6 = g.reshape(9, P, ci, P, co)
    return jnp.einsum("kpiqo,pq->pkio", g6, jnp.eye(P, dtype=g.dtype))


def pack_stem(w1: jax.Array, b1: jax.Array):
    """(P,3,3,1,C1) stem weights + (P,C1) biases → packed s2d GEMM form
    (9·4P, 4·P·C1) / (4·P·C1,), group-outer client-inner columns."""
    P, _, _, _, C1 = w1.shape
    L = jnp.asarray(_s2d_lift_matrix(C1))
    lifted = (w1.reshape(P, 1, 9 * C1) @ L).reshape(P, 36, 4 * C1)
    # rows (k, i): i is the s2d input channel; cols (g, o)
    t = lifted.reshape(P, 9, 4, 4, C1)
    # block-diag with cols reordered group-outer: (k, c, i, g, q, o)
    packed = jnp.einsum("pkigo,pq->kpigqo", t, jnp.eye(P, dtype=w1.dtype))
    w1s_p = packed.reshape(9 * 4 * P, 4 * P * C1)
    b1s_p = jnp.tile(b1.reshape(P * C1), 4)
    return w1s_p, b1s_p


def unpack_stem_grads(dw1s_p: jax.Array, db1s_p: jax.Array, P: int,
                      C1: int):
    """Adjoint of pack_stem → ((P,3,3,1,C1), (P,C1))."""
    g6 = dw1s_p.reshape(9, P, 4, 4, P, C1)
    per = jnp.einsum("kpigqo,pq->pkigo", g6, jnp.eye(P, dtype=dw1s_p.dtype))
    per = per.reshape(P, 36 * 4 * C1)
    L = jnp.asarray(_s2d_lift_matrix(C1))
    dw1 = (per @ L.T).reshape(P, 3, 3, 1, C1)
    db1 = db1s_p.reshape(4, P, C1).sum(0)
    return dw1, db1


def pack_conv2(w2: jax.Array):
    """(P,3,3,C1,C2) → block-diag (9·P·C1, P·C2)."""
    P, _, _, C1, C2 = w2.shape
    return _eye_pack(w2.reshape(P, 9, C1, C2), P)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv_stack_packed(x_imgs: jax.Array, w1: jax.Array, b1: jax.Array,
                      w2: jax.Array, b2: jax.Array) -> jax.Array:
    """conv_stack for P clients at once, channel-packed on the lanes.

    x_imgs (P, B, 2H, 2W, 1), w1 (P,3,3,1,C1), b1 (P,C1),
    w2 (P,3,3,C1,C2), b2 (P,C2) → (P, B, H/2, W/2, C2). Bit-identical
    semantics to vmap(conv_stack) (tests/test_conv_block.py); the VJP
    returns zero image gradient like conv_stack."""
    out, _ = _packed_fwd(x_imgs, w1, b1, w2, b2)
    return out


def _packed_fwd(x_imgs, w1, b1, w2, b2):
    P, B = x_imgs.shape[0], x_imgs.shape[1]
    C1, C2 = w1.shape[-1], w2.shape[-1]
    x_pack = jnp.moveaxis(x_imgs[..., 0], 0, -1)       # (B, 2H, 2W, P)
    w1s_p, b1s_p = pack_stem(w1, b1)
    w2m_p = pack_conv2(w2)
    b2_p = b2.reshape(P * C2)
    pooled = _fwd_call_impl(x_pack, w1s_p, b1s_p, w2m_p, b2_p)
    Ho, Wo = pooled.shape[1], pooled.shape[2]
    out = jnp.moveaxis(pooled.reshape(B, Ho, Wo, P, C2), 3, 0)
    return out, (x_pack, w1s_p, b1s_p, w2m_p, b2_p, P, C1, C2)


def _packed_bwd(res, g):
    x_pack, w1s_p, b1s_p, w2m_p, b2_p, P, C1, C2 = res
    B = x_pack.shape[0]
    Ho, Wo = g.shape[2], g.shape[3]
    g_pack = jnp.moveaxis(g, 0, 3).reshape(B, Ho, Wo, P * C2)
    dw1s_p, db1s_p, dw2_p, db2_p = _bwd_call_impl(
        g_pack, x_pack, w1s_p, b1s_p, w2m_p, b2_p)
    dw1, db1 = unpack_stem_grads(dw1s_p, db1s_p, P, C1)
    dw2 = _eye_unpack(dw2_p, P, C1, C2).reshape(P, 3, 3, C1, C2)
    db2 = db2_p.reshape(P, C2)
    dx = jnp.zeros((P, B) + x_pack.shape[1:3] + (1,), x_pack.dtype)
    return (dx, dw1.astype(jnp.float32), db1.astype(jnp.float32),
            dw2.astype(jnp.float32), db2.astype(jnp.float32))


def _packed_fwd_vjp(x_imgs, w1, b1, w2, b2):
    out, res = _packed_fwd(x_imgs, w1, b1, w2, b2)
    return out, res


conv_stack_packed.defvjp(_packed_fwd_vjp, _packed_bwd)
