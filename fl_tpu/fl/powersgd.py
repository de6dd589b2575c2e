"""PowerSGD low-rank uplink compression (Vogels et al., NeurIPS 2019).

Third member of the on-chip uplink-compression family (fl_tpu.fl.uplink
provides int8 and top-k; the reference's wire-side family is
/root/reference/src/shared/compression.py:26-370 — LZ4 / quantization /
top-k sparsification; it has no low-rank compressor, so this is a
capability extension). Each matrix-shaped layer delta M (n×m) is
approximated by ONE power iteration against a warm-started right factor:

    P = M Q            (n×r)       — "compress" left factor
    P ← orthonormalize(P)          — modified Gram-Schmidt
    Q' = Mᵀ P          (m×r)       — new right factor, carried to next round
    M̂ = P Q'ᵀ = proj_colspace(P) M — what the server reconstructs

The client transmits (P, Q') — (n+m)·r floats instead of n·m — and keeps
the residual M − M̂ in the standard error-feedback accumulator (Karimireddy
et al. 2019), which restores convergence for this biased compressor.
Warm-starting Q across rounds makes the single power iteration track the
top-r subspace of the (slowly varying) delta stream; because M̂ is the
orthogonal projection of M onto col(MQ), a delta of true rank ≤ r is
transmitted EXACTLY (almost surely), regardless of Q's basis.

TPU formulation: all clients' layer deltas move as one (C, n, m) tensor and
every step above is a batched GEMM (`einsum` over the client axis) — the
compressor is MXU work end to end, no gathers/scatters. Vector-shaped
leaves (biases, norm scales) are transmitted uncompressed, as in the paper
(§3, "rank-1+ for matrices, uncompressed for the rest").

State packing: the engine threads ONE flat (C, W) uplink-state array
through the superstep. PowerSGD appends its flattened per-client Q factors
after the error-feedback region:

    state[:, :D_pad]  — error feedback (same layout as int8/topk)
    state[:, D_pad:]  — concatenated Q matrices, one (m·r) block per
                        compressed leaf, lane-padded

so the superstep arity, client-axis sharding, and checkpointing
(orchestration/checkpoint.py saves the whole buffer) are unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fl_tpu.ops.flatten import LANE, padded_dim


@dataclasses.dataclass(frozen=True)
class _MatrixEntry:
    offset: int    # column offset of this leaf in the flat (C, D) matrix
    n: int         # rows of the matrix view  (prod(shape[:-1]))
    m: int         # cols of the matrix view  (shape[-1])
    q_offset: int  # offset of this leaf's Q block in the Q region


@dataclasses.dataclass(frozen=True)
class PowerSGDPlan:
    """Host-side compression plan derived from the model's leaf shapes."""

    rank: int
    d: int          # unpadded flat parameter dimension
    d_pad: int      # lane-padded width of the delta matrix / EF region
    dq_pad: int     # lane-padded width of the Q region
    entries: Tuple[_MatrixEntry, ...]

    @property
    def state_width(self) -> int:
        """Total uplink-state width: EF region + Q region."""
        return self.d_pad + self.dq_pad

    def compressed_floats(self) -> int:
        """Floats transmitted per client per round under this plan."""
        matrix_coords = sum(e.n * e.m for e in self.entries)
        factor_coords = sum((e.n + e.m) * self.rank for e in self.entries)
        return self.d - matrix_coords + factor_coords

    def compression_ratio(self) -> float:
        """Uplink reduction factor vs. sending the raw delta."""
        return self.d / max(1, self.compressed_floats())


def make_powersgd_plan(template: Any, rank: int) -> PowerSGDPlan:
    """Build a plan from an UNBATCHED variables pytree (the global model).

    Leaf traversal order and per-leaf column extents match
    :func:`fl_tpu.ops.flatten.stack_flatten` (jax.tree.flatten order,
    row-major reshape), so ``offset`` indexes directly into the engine's
    flat delta matrix. A leaf is compressed iff it is a float tensor with
    ndim ≥ 2 viewed as (prod(shape[:-1]), shape[-1]) AND the factored form
    (n+m)·r is strictly smaller than n·m — tiny matrices pass through.
    """
    if rank < 1:
        raise ValueError(f"powersgd rank must be ≥ 1, got {rank}")
    leaves = jax.tree.leaves(template)
    entries: List[_MatrixEntry] = []
    offset = 0
    q_offset = 0
    for leaf in leaves:
        size = int(np.prod(leaf.shape))
        if (jnp.issubdtype(leaf.dtype, jnp.floating) and leaf.ndim >= 2):
            n = int(np.prod(leaf.shape[:-1]))
            m = int(leaf.shape[-1])
            if (n + m) * rank < n * m:
                entries.append(_MatrixEntry(offset, n, m, q_offset))
                q_offset += m * rank
        offset += size
    d = offset
    return PowerSGDPlan(
        rank=rank, d=d, d_pad=padded_dim(d),
        dq_pad=padded_dim(max(q_offset, 1)),
        entries=tuple(entries),
    )


def init_uplink_state(key: jax.Array, plan: PowerSGDPlan,
                      num_clients: int) -> jax.Array:
    """(C, d_pad + dq_pad) initial state: zero EF, standard-normal Q.

    Random Q init (paper §2, Alg. 2): the first power iteration then
    captures a uniformly random r-dimensional sketch of the first delta,
    and warm starting takes over from round 2.
    """
    ef = jnp.zeros((num_clients, plan.d_pad), jnp.float32)
    q = jax.random.normal(key, (num_clients, plan.dq_pad), jnp.float32)
    return jnp.concatenate([ef, q], axis=1)


def _orthonormalize(p: jax.Array) -> jax.Array:
    """Batched modified Gram-Schmidt over the last axis: (C, n, r).

    r is static and tiny (≤ ~8), so the Python loop unrolls into a short
    chain of batched dots. A degenerate column (one already spanned by its
    predecessors — e.g. when the true rank of MQ is below r) is ZEROED,
    not normalized: its post-orthogonalization residual is roundoff noise,
    and normalizing that noise yields a unit vector with O(1) overlap into
    the span, which corrupts the projector P Pᵀ by O(‖M‖). A zero column
    contributes nothing, the correct limit.
    """
    r = p.shape[-1]
    cols = []
    for i in range(r):
        v = p[:, :, i]
        orig = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
        for u in cols:
            v = v - jnp.sum(v * u, axis=1, keepdims=True) * u
        norm = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
        degenerate = norm <= 1e-5 * orig + 1e-30
        cols.append(jnp.where(degenerate, 0.0,
                              v / jnp.maximum(norm, 1e-30)))
    return jnp.stack(cols, axis=2)


def powersgd_roundtrip(carried: jax.Array, q_flat: jax.Array,
                       plan: PowerSGDPlan) -> Tuple[jax.Array, jax.Array]:
    """One power-iteration compress→reconstruct pass over all clients.

    carried: (C, d_pad) f32 delta (+EF) matrix; q_flat: (C, dq_pad) f32.
    Returns (reconstructed (C, d_pad), new q (C, dq_pad)). Columns of
    ``carried`` not covered by a matrix entry (vector leaves, lane padding)
    pass through unchanged — they are transmitted uncompressed.
    """
    c = carried.shape[0]
    r = plan.rank
    out = carried
    new_q = q_flat
    for e in plan.entries:
        mat = jax.lax.dynamic_slice_in_dim(
            carried, e.offset, e.n * e.m, axis=1
        ).reshape(c, e.n, e.m)
        q = jax.lax.dynamic_slice_in_dim(
            q_flat, e.q_offset, e.m * r, axis=1
        ).reshape(c, e.m, r)
        p = jnp.einsum("cnm,cmr->cnr", mat, q,
                       preferred_element_type=jnp.float32)
        p = _orthonormalize(p)
        qn = jnp.einsum("cnm,cnr->cmr", mat, p,
                        preferred_element_type=jnp.float32)
        hat = jnp.einsum("cnr,cmr->cnm", p, qn,
                         preferred_element_type=jnp.float32)
        out = jax.lax.dynamic_update_slice_in_dim(
            out, hat.reshape(c, e.n * e.m), e.offset, axis=1)
        new_q = jax.lax.dynamic_update_slice_in_dim(
            new_q, qn.reshape(c, e.m * r), e.q_offset, axis=1)
    return out, new_q


def apply_powersgd_with_error_feedback(
        mat: jax.Array, state: jax.Array, mask: jax.Array,
        plan: PowerSGDPlan) -> Tuple[jax.Array, jax.Array]:
    """One EF-composed PowerSGD step over participant rows.

    transmitted = powersgd(delta + e_t); e_{t+1} = delta + e_t − transmitted.
    Non-participants transmit nothing and keep EF and Q unchanged (their
    ``mat`` rows may hold garbage — never folded into state).
    Returns (transmitted (C, d_pad), new state (C, d_pad + dq_pad)).
    """
    ef = state[:, :plan.d_pad]
    q = state[:, plan.d_pad:]
    alive = (mask > 0.0).astype(mat.dtype)[:, None]
    carried = mat + ef
    tx, qn = powersgd_roundtrip(carried, q, plan)
    tx = tx * alive
    new_ef = jnp.where(alive > 0, carried - tx, ef)
    new_q = jnp.where(alive > 0, qn, q)
    return tx, jnp.concatenate([new_ef, new_q], axis=1)
