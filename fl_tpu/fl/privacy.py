"""Differential privacy: clipping, Gaussian mechanism, budget accounting.

Parity target: src/shared/privacy.py. Two DP modes are provided, exactly as
SURVEY.md §7 requires:

1. **Reference ("delta-clipping") mode** — what the reference actually does
   (privacy.py:284-311 + federated_trainer.py:428-469): the client computes
   Δ = θ_local − θ_global, clips Δ's *global* L2 norm to C, then adds
   Gaussian noise with sensitivity = the clipped norm itself:
   σ = min(‖Δ‖, C)·√(2·ln(1.25/δ))/ε (privacy.py:209), consuming (ε, δ)
   additively from the budget per operation. Implemented bit-for-bit
   formula-compatible so round-for-round fidelity holds.

2. **Per-example DP-SGD mode** — the principled mechanism the reference's
   docs gesture at (opacus in requirements but unused): per-example gradient
   clipping to C inside every SGD step, then Gaussian noise with
   σ = noise_multiplier·C/B on the mean gradient. This is the north-star
   config #3 path; its fused Pallas kernel lives in fl_tpu.ops.dp.

Both modes run on-device and vmap over the client axis. Host-side classes
(:class:`DifferentialPrivacyEngine`, :class:`PrivacyBudgetTracker`,
:class:`PrivacyAccountant`) mirror the reference API for the services layer.
"""

from __future__ import annotations

import json
import logging
import math
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from fl_tpu.core import prng
from fl_tpu.core import pytree as pt
from fl_tpu.core.types import PrivacyConfig

logger = logging.getLogger(__name__)


class PrivacyError(Exception):
    """ref: PrivacyError, src/shared/privacy.py:20-22."""


# ---------------------------------------------------------------------------
# The math (shared by host + device paths)
# ---------------------------------------------------------------------------

def gaussian_sigma(sensitivity: float, epsilon: float, delta: float):
    """Gaussian-mechanism noise scale σ = s·√(2·ln(1.25/δ))/ε
    (ref: src/shared/privacy.py:209). Works on floats and traced scalars."""
    return sensitivity * math.sqrt(2.0 * math.log(1.25 / delta)) / epsilon


def validate_privacy_parameters(epsilon: float, delta: float) -> bool:
    """ref: validate_privacy_parameters, privacy.py:335-356."""
    if epsilon <= 0:
        logger.error("Epsilon must be positive")
        return False
    if epsilon > 10.0:
        logger.warning("Epsilon %s is very high, privacy may be weak", epsilon)
    if delta <= 0 or delta >= 1:
        logger.error("Delta must be in (0, 1)")
        return False
    if delta > 1e-3:
        logger.warning("Delta %s is high, privacy may be weak", delta)
    return True


def advanced_composition_epsilon(epsilon: float, delta: float, steps: int) -> float:
    """Simplified advanced-composition estimate
    ε' = ε·√(2·k·ln(1/δ)) + k·ε·(e^ε − 1)
    (ref: calculate_privacy_budget, privacy.py:319-333)."""
    if steps <= 1:
        return epsilon
    eps = epsilon * math.sqrt(2.0 * steps * math.log(1.0 / delta))
    eps += steps * epsilon * (math.exp(epsilon) - 1.0)
    return eps


# ---------------------------------------------------------------------------
# Device path — reference (delta-clipping) mode
# ---------------------------------------------------------------------------

def clip_and_noise_tree(
    tree: Any,
    key: jax.Array,
    epsilon: float,
    delta: float,
    max_norm: float,
) -> Tuple[Any, jax.Array, jax.Array]:
    """Reference-mode DP on a weight-delta pytree (one client).

    clip global L2 norm to ``max_norm`` → σ from the *clipped* norm
    (privacy.py:296-301) → i.i.d. Gaussian noise on every element.
    Returns (noisy_tree, clipped_norm, sigma). vmap over clients with
    per-client keys for the population version.
    """
    clipped, sens = pt.clip_by_global_norm(tree, max_norm)
    sigma = sens * (math.sqrt(2.0 * math.log(1.25 / delta)) / epsilon)
    leaves, treedef = jax.tree.flatten(clipped)
    keys = jax.random.split(key, len(leaves))
    noisy = [
        leaf + sigma * jax.random.normal(k, leaf.shape, jnp.float32).astype(leaf.dtype)
        for leaf, k in zip(leaves, keys)
    ]
    return jax.tree.unflatten(treedef, noisy), sens, sigma


def clip_and_noise_tree_at_sigma(
    tree: Any,
    key: jax.Array,
    max_norm: float,
    sigma: float,
) -> Tuple[Any, jax.Array]:
    """Clip a delta pytree to global L2 ≤ ``max_norm`` and add i.i.d.
    N(0, σ²) with an EXPLICIT σ (the caller owns the accounting).

    Used by wire adaptive clipping (Andrew et al. 2021): the joint
    release of (delta at σ = z_Δ·C, indicator at σ_b) is one Gaussian
    mechanism at the user-level multiplier z, so the delta must be noised
    at the *inflated* z_Δ from ``adaptive_clip_delta_multiplier`` rather
    than at the plain Gaussian-mechanism σ of ``clip_and_noise_tree``.
    Returns (noisy_tree, pre-clip norm)."""
    pre_norm = pt.global_norm(tree)
    clipped, _ = pt.clip_by_global_norm(tree, max_norm)
    leaves, treedef = jax.tree.flatten(clipped)
    keys = jax.random.split(key, len(leaves))
    noisy = [
        leaf + sigma * jax.random.normal(k, leaf.shape, jnp.float32
                                         ).astype(leaf.dtype)
        for leaf, k in zip(leaves, keys)
    ]
    return jax.tree.unflatten(treedef, noisy), pre_norm


def dp_noise_client_deltas(
    stacked_deltas: Any,
    round_keys: jax.Array,
    epsilon: float,
    delta: float,
    max_norm: float,
    use_pallas: Optional[bool] = None,
    mesh=None,
    interpret: bool = False,
) -> Tuple[Any, jax.Array, jax.Array]:
    """Population version: reference-mode DP over stacked client deltas
    (leading axis C). Each client gets an independent noise stream derived
    from its (round, client) key folded with the DP_NOISE tag.

    On TPU this routes through the fused Pallas clip+noise kernel over the
    flat (C, D) update matrix (fl_tpu.ops.dp); elsewhere it is the vmapped
    tree-based jnp path. Both share the same clip/σ math.

    With ``mesh`` given, the Pallas kernel runs under ``jax.shard_map`` over
    the mesh's client axis: the computation is purely per-client, so each
    device runs the kernel on its local (C/n, D) block with zero
    collectives — making the fused kernel usable inside the sharded
    superstep (it previously fell back to jnp under a mesh)."""
    from fl_tpu.ops import dp as dp_kernels
    from fl_tpu.ops.flatten import flat_dim, stack_flatten, stack_unflatten

    if use_pallas is None:
        use_pallas = dp_kernels.on_tpu()

    nkeys = jax.vmap(lambda k: prng.stream_key(k, prng.Stream.DP_NOISE))(
        round_keys
    )
    if use_pallas:
        # Per-leaf-GROUP epilogue (round 5): the old path flattened the
        # whole stacked tree into one (C, D) matrix — a concat + pad +
        # unflatten that copies the full per-client parameter set twice
        # (~15 ms/round of pure data movement at bench shapes,
        # docs/performance.md round-5 table). Instead: (1) the global
        # per-client norm comes from per-leaf reductions (XLA fuses them
        # into the delta producers); (2) each leaf whose flat width
        # admits a zero-copy (C, 8, D/8) view runs the scale+noise
        # kernel STANDALONE (SimpleCNN's fc1 — 95% of the bytes — does);
        # (3) the remaining small leaves are concatenated (a copy of a
        # few per-mille of the tree) and padded to the default chunk.
        # Noise independence across groups: each group folds its index
        # into the per-client DP_NOISE key before the int32 seed is
        # extracted, so no (seed + tile) stream is ever reused.
        def apply_noise(tree, nkeys_in):
            leaves, treedef = jax.tree.flatten(tree)
            C = leaves[0].shape[0]
            flats = [l.reshape(C, -1).astype(jnp.float32) for l in leaves]
            sq = None
            for f in flats:
                part = jnp.sum(f * f, axis=1)
                sq = part if sq is None else sq + part
            norms = jnp.sqrt(sq)
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norms, 1e-12))
            sens = jnp.minimum(norms, max_norm)
            sigma = sens * dp_kernels.gaussian_factor(epsilon, delta)

            big = [i for i, f in enumerate(flats)
                   if dp_kernels.leaf_chunk(f.shape[1]) is not None]
            rest = [i for i in range(len(flats)) if i not in big]

            def seeds_for(gi):
                gkeys = jax.vmap(
                    lambda k: jax.random.fold_in(k, gi))(nkeys_in)
                data = jax.random.key_data(gkeys).astype(jnp.uint32)
                return (data[:, 0] ^ data[:, -1]).astype(jnp.int32)

            noisy = [None] * len(flats)
            for gi, i in enumerate(big):
                f = flats[i]
                noisy[i] = dp_kernels._clip_noise_pallas(
                    f, scale, sigma, seeds_for(gi), interpret=interpret,
                    chunk=dp_kernels.leaf_chunk(f.shape[1]))
            if rest:
                cat = jnp.concatenate([flats[i] for i in rest], axis=1)
                d = cat.shape[1]
                pad = (-d) % dp_kernels.TILE
                if pad:
                    cat = jnp.pad(cat, ((0, 0), (0, pad)))
                out = dp_kernels._clip_noise_pallas(
                    cat, scale, sigma, seeds_for(len(big)),
                    interpret=interpret)[:, :d]
                off = 0
                for i in rest:
                    w = flats[i].shape[1]
                    noisy[i] = jax.lax.dynamic_slice_in_dim(
                        out, off, w, axis=1)
                    off += w
            rebuilt = [n.reshape(l.shape).astype(l.dtype)
                       for n, l in zip(noisy, leaves)]
            return (jax.tree.unflatten(treedef, rebuilt), sens, sigma)

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            from fl_tpu.core.mesh import CLIENT_AXIS

            axis = mesh.axis_names[0] if mesh.axis_names else CLIENT_AXIS
            spec_c = P(axis)
            # check_vma=False: pallas_call's out_shape carries no
            # varying-mesh-axes annotation, which the checker requires
            apply_noise = jax.shard_map(
                apply_noise, mesh=mesh,
                in_specs=(spec_c, spec_c),
                out_specs=(spec_c, spec_c, spec_c),
                check_vma=False,
            )
        return apply_noise(stacked_deltas, nkeys)

    def one(delta_tree, nkey):
        return clip_and_noise_tree(delta_tree, nkey, epsilon, delta, max_norm)

    return jax.vmap(one)(stacked_deltas, nkeys)


# ---------------------------------------------------------------------------
# Device path — client-level DP (central aggregator noise)
# ---------------------------------------------------------------------------

def clip_client_deltas(stacked_deltas: Any, max_norm: float
                       ) -> Tuple[Any, jax.Array]:
    """Clip each client's delta to global L2 norm ≤ C (no per-client noise).
    Returns (clipped stacked deltas, per-client pre-clip norms)."""

    def one(tree):
        clipped, _ = pt.clip_by_global_norm(tree, max_norm)
        return clipped

    norms = jax.vmap(pt.global_norm)(stacked_deltas)
    return jax.vmap(one)(stacked_deltas), norms


def central_noise_tree(tree: Any, key: jax.Array, sigma) -> Any:
    """Add N(0, σ²) to every element of a (non-stacked) pytree — the
    aggregator-side noise of client-level DP-FedAvg (McMahan et al. 2018:
    uniform-mean of C-clipped client updates has sensitivity C/m, so
    σ = z·C/m gives the subsampled-Gaussian guarantee at client level,
    accounted with q = participation rate per round)."""
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(key, len(leaves))
    noisy = [
        leaf + sigma * jax.random.normal(k, leaf.shape, jnp.float32
                                         ).astype(leaf.dtype)
        for leaf, k in zip(leaves, keys)
    ]
    return jax.tree.unflatten(treedef, noisy)


# ---------------------------------------------------------------------------
# Adaptive clipping (Andrew et al. 2021, "Differentially Private Learning
# with Adaptive Clipping") — client-level quantile tracking for client_dp
# ---------------------------------------------------------------------------

def adaptive_clip_delta_multiplier(
    noise_multiplier: float, count_stddev: float
) -> float:
    """Noise multiplier z_Δ to apply to the clipped-delta aggregate so that
    jointly releasing (aggregate noised at z_Δ·C, centered clipped-count
    noised at σ_b) is dominated by a single Gaussian mechanism at the
    user-specified ``noise_multiplier`` z.

    Andrew et al. 2021, Theorem 1: each participant contributes the
    concatenated record (Δ_i/C of L2 ≤ 1, b_i − ½ of magnitude ½); Gaussian
    noise (z_Δ, σ_b) on the pair is one Gaussian mechanism with effective
    multiplier z where  z⁻² = z_Δ⁻² + (2σ_b)⁻².  Solving for z_Δ keeps the
    RDP accounting identical to the non-adaptive mechanism at z — the
    accountant does not change, only the aggregate's noise grows slightly.
    """
    if count_stddev <= 0:
        raise PrivacyError("count_stddev must be positive")
    inv = noise_multiplier ** -2 - (2.0 * count_stddev) ** -2
    if inv <= 0:
        raise PrivacyError(
            f"adaptive clipping infeasible: need 2·count_stddev > "
            f"noise_multiplier (got σ_b={count_stddev}, z={noise_multiplier})"
            " — raise clip_count_stddev or lower the noise multiplier"
        )
    return float(inv ** -0.5)


def noisy_clipped_fraction(
    centered_sum: jax.Array, expected_count: jax.Array,
    count_stddev: float, key: jax.Array,
) -> jax.Array:
    """DP estimate of the fraction of participants whose pre-clip norm was
    ≤ C, from the already-reduced centered sum Σᵢ mᵢ·(bᵢ − ½) (per-client
    contribution magnitude ½ ⇒ count noise σ_b is multiplier 2σ_b).
    Uses the fixed expected participant count m̄ = q·N as denominator —
    same public-denominator rule as the client_dp aggregate itself."""
    noisy = centered_sum + count_stddev * jax.random.normal(key, ())
    return noisy / expected_count + 0.5


def geometric_clip_update(
    clip_norm: jax.Array, noisy_fraction: jax.Array,
    target_quantile: float, learning_rate: float,
) -> jax.Array:
    """Geometric quantile-tracking step (Andrew et al. 2021, Alg. 1):
    C ← C·exp(−η_C·(b̃ − γ)). Fixed point is the γ-quantile of client
    delta norms: b̃ > γ (clip too high) shrinks C, b̃ < γ grows it."""
    return clip_norm * jnp.exp(
        -learning_rate * (noisy_fraction - target_quantile))


# ---------------------------------------------------------------------------
# Device path — per-example DP-SGD mode
# ---------------------------------------------------------------------------

def make_dp_sgd_grad_fn(
    loss_fn: Callable,
    max_grad_norm: float,
    noise_multiplier: float,
    microbatch_size: int = 16,
) -> Callable:
    """Build a per-example-clipped, noised gradient function for DP-SGD.

    ``loss_fn(params, extra_vars, xb, yb, dropout_key) -> (loss, aux)`` is the
    same loss used for plain training. The returned function computes
    per-example gradients, clips each example's global grad norm to C,
    zeroes examples whose ``wmask`` entry is 0 (padded shard slots — see
    fl_tpu.fl.local_training: masking instead of remapping keeps each real
    example's per-step inclusion probability at exactly batch/shard_len,
    matching the accountant's q), averages over the FIXED batch size B, and
    adds N(0, (z·C/B)²) noise — so masked slots never weaken the mechanism.

    Memory discipline: per-example gradients are |params|×B floats — at
    hundreds of vmapped clients they would exceed HBM. The batch is
    therefore processed in ``microbatch_size`` chunks via ``lax.scan``:
    each chunk's per-example grads are computed (vmapped vjp — on TPU this
    batches onto the same MXU ops as the plain gradient), clipped, summed,
    and the chunk buffer is freed before the next. Peak live memory is
    C × microbatch_size × |params| instead of C × B × |params|.

    The fused clip+noise flat-vector Pallas kernel lives in fl_tpu.ops.dp;
    this jnp formulation is the portable reference the kernel is tested
    against.
    """

    def chunk_clipped_sum(params, extra, xc, yc, wc, dkey):
        """Sum of per-example clipped (and mask-weighted) grads for one
        (m, ...) chunk."""
        m = xc.shape[0]

        def one(x, y):
            return jax.grad(
                lambda p: loss_fn(p, extra, x[None], y[None], dkey)[0]
            )(params)

        grads = jax.vmap(one)(xc, yc)  # leaves (m, ...)
        sq = [jnp.sum(jnp.square(g.reshape(m, -1)), axis=1)
              for g in jax.tree.leaves(grads)]
        norms = jnp.sqrt(jnp.sum(jnp.stack(sq), axis=0))
        scale = jnp.minimum(1.0, max_grad_norm / jnp.maximum(norms, 1e-12))
        scale = scale * wc  # padded slots contribute exactly zero
        return jax.tree.map(
            lambda g: jnp.tensordot(scale, g, axes=1), grads
        )

    def dp_grad(params, extra, xb, yb, wmask, dkey, noise_key):
        batch = xb.shape[0]
        m = min(microbatch_size, batch)
        n_chunks = batch // m
        assert n_chunks * m == batch, (
            f"batch {batch} must be divisible by microbatch {m}"
        )
        xcs = xb.reshape((n_chunks, m) + xb.shape[1:])
        ycs = yb.reshape((n_chunks, m) + yb.shape[1:])
        wcs = jnp.asarray(wmask, jnp.float32).reshape((n_chunks, m))

        def body(acc, xyw):
            xc, yc, wc = xyw
            s = chunk_clipped_sum(params, extra, xc, yc, wc, dkey)
            return pt.tree_add(acc, s), None

        zero = jax.tree.map(jnp.zeros_like, params)
        total, _ = jax.lax.scan(body, zero, (xcs, ycs, wcs))
        mean_grad = jax.tree.map(lambda g: g / batch, total)
        sigma = noise_multiplier * max_grad_norm / batch
        leaves, treedef = jax.tree.flatten(mean_grad)
        keys = jax.random.split(noise_key, len(leaves))
        noisy = [
            g + sigma * jax.random.normal(k, g.shape, g.dtype)
            for g, k in zip(leaves, keys)
        ]
        return jax.tree.unflatten(treedef, noisy)

    return dp_grad


def make_ghost_dp_sgd_grad_fn(
    model,
    max_grad_norm: float,
    noise_multiplier: float,
    norm_chunk: Optional[int] = None,
) -> Callable:
    """Ghost-norm (two-pass) DP-SGD: same mechanism as
    :func:`make_dp_sgd_grad_fn` without ever materializing per-example
    gradient trees.

    The microbatch implementation pays ~8× a plain step because the
    per-example gradients of the fc1 kernel alone are B × 401K floats. The
    ghost formulation (Goodfellow 2015; Li et al. 2021 "ghost clipping")
    computes each example's gradient *norm* from per-layer
    (input activation, output gradient) pairs obtained in ONE batched
    backward, then gets the clipped-sum gradient from a second batched
    backward of the scale-reweighted loss:

    - pass 1: forward with ``dp_capture`` (layer inputs) + one backward
      w.r.t. zero ``dp_perturb`` offsets at each layer's pre-activation —
      its gradient IS the per-example layer-output gradient dy_i (examples
      are independent in a summed loss);
    - per-example norms: Dense kernels use the exact ghost identity
      ‖g_i‖² = ‖x_i‖²·‖dy_i‖²; 3×3 convs (tiny kernels here) form the
      per-example weight grad explicitly as one batched patch GEMM
      (fl_tpu.ops.fast_layers lane-major patches); biases use ‖Σ_s dy‖²;
    - pass 2: d/dθ Σ_i s_i·loss_i with s_i = min(1, C/‖g_i‖)·mask_i gives
      the clipped masked sum in one backward.

    Total ≈ 1 forward + 2 backwards ≈ 2-3× a plain step. Noise is applied
    identically (same key-split order) to the microbatch path, so both
    implementations produce the SAME noisy gradient for the same inputs —
    asserted in tests/test_dp_sgd_semantics.py.

    Requires a model whose module declares ``DP_LAYERS`` and supports the
    ``dp_capture`` / ``dp_perturb`` kwargs (SimpleCNN). The model must not
    carry batch statistics (none of the instrumented models do).
    """
    import optax

    module = model.module
    layers = module.DP_LAYERS

    def per_example_losses(logits, yb):
        return optax.softmax_cross_entropy_with_integer_labels(logits, yb)

    def dp_grad(params, extra, xb, yb, wmask, dkey, noise_key):
        batch = xb.shape[0]
        variables = {"params": params, **extra}
        rngs = {"dropout": dkey}

        # capture shapes only (free — no FLOPs): the captures themselves
        # come out of pass 1's forward via has_aux, so the norm pass costs
        # ONE forward + ONE backward, not two forwards
        caps_shapes = jax.eval_shape(
            lambda v: module.apply(v, xb, train=True, rngs=rngs,
                                   dp_capture=True)[1], variables)

        # pass 1: per-example layer-output grads via zero perturbations,
        # capturing layer inputs in the same forward
        def preact_shape(name, kind):
            if kind == "groupnorm":
                # output shape == the captured input's shape
                return caps_shapes[name].shape
            out_features = params[name]["kernel"].shape[-1]
            if kind == "conv3x3":
                return caps_shapes[name].shape[:-1] + (out_features,)
            return (batch, out_features)

        entries = [(e[0], e[1], e[2] if len(e) > 2 else {}) for e in layers]
        zeros = {name: jnp.zeros(preact_shape(name, kind), jnp.float32)
                 for name, kind, _ in entries}

        def summed_loss_of_perturb(perturb):
            logits, caps_ = module.apply(variables, xb, train=True,
                                         rngs=rngs, dp_perturb=perturb,
                                         dp_capture=True)
            return jnp.sum(per_example_losses(logits, yb)), caps_

        dys, caps = jax.grad(summed_loss_of_perturb, has_aux=True)(zeros)

        # per-example global grad norm²
        def conv_sq(a_c, dy_c):
            """(m,H,W,I), (m,H,W,O) -> (m,) kernel+bias grad norm².

            Tap-wise: nine pad-shifted VIEWS of the input, each contracted
            against dy as one batched GEMM, squared and accumulated. The
            previous lane-major patch formulation materialized a 9I×
            patch tensor plus layout transforms; the round-3 xplane
            profile put ~49% of the ghost round in the resulting
            copies/reshapes/pads + the chunk scan's dynamic-slices. The
            tap form's only transient is the (m, I, O) per-tap grad, and
            the slice+convert fuse into the dot operands.
            """
            m_, H, W, I = a_c.shape
            O = dy_c.shape[-1]
            ap = jnp.pad(a_c, ((0, 0), (1, 1), (1, 1), (0, 0)))
            dyf = dy_c.reshape(m_, H * W, O)
            s = jnp.sum(jnp.square(jnp.sum(dy_c, axis=(1, 2))), axis=-1)
            for ky in range(3):
                for kx in range(3):
                    xt = ap[:, ky:ky + H, kx:kx + W, :].reshape(m_, H * W, I)
                    g = jnp.einsum("bmi,bmo->bio", xt, dyf,
                                   preferred_element_type=jnp.float32)
                    s = s + jnp.sum(g * g, axis=(1, 2))
            return s

        sq = jnp.zeros((batch,), jnp.float32)
        for name, kind, meta in entries:
            a = caps[name].astype(jnp.float32)
            dy = dys[name].astype(jnp.float32)
            if kind == "dense":
                dy_sq = jnp.sum(dy * dy, axis=1)
                sq += jnp.sum(a * a, axis=1) * dy_sq   # kernel (ghost)
                sq += dy_sq                            # bias
            elif kind == "conv3x3":
                # optional batch chunking bounds the per-tap transient
                # when this runs vmapped over hundreds of clients
                # (default: whole batch — the tap form's transients are
                # small and the chunk scan's dynamic-slice/pad traffic
                # measured ~90 ms/round at 32 clients)
                m = (norm_chunk if norm_chunk and batch % norm_chunk == 0
                     else batch)
                if m < batch:
                    ac = a.reshape((batch // m, m) + a.shape[1:])
                    dyc = dy.reshape((batch // m, m) + dy.shape[1:])
                    _, sqs = jax.lax.scan(
                        lambda carry, ad: (carry, conv_sq(*ad)), None,
                        (ac, dyc))
                    sq += sqs.reshape(batch)
                else:
                    sq += conv_sq(a, dy)
            elif kind == "groupnorm":
                # a = the GN INPUT; recompute x̂ with the layer's group
                # statistics (NOT by inverting the affine output, which
                # divides by the learned scale — inf/NaN at scale→0).
                # Per-example grads are then spatial reductions:
                # g_scale_i = Σ_s dy·x̂, g_bias_i = Σ_s dy
                groups = int(meta["groups"])
                eps = float(meta.get("eps", 1e-6))
                C_ch = a.shape[-1]
                grouped = a.reshape(a.shape[:-1] + (groups, C_ch // groups))
                red = tuple(range(1, grouped.ndim - 2)) + (grouped.ndim - 1,)
                mu = jnp.mean(grouped, axis=red, keepdims=True)
                var = jnp.mean(jnp.square(grouped - mu), axis=red,
                               keepdims=True)
                x_hat = ((grouped - mu) / jnp.sqrt(var + eps)).reshape(a.shape)
                axes = tuple(range(1, a.ndim - 1))  # spatial dims
                g_scale = jnp.sum(dy * x_hat, axis=axes)   # (B, C)
                g_bias = jnp.sum(dy, axis=axes)            # (B, C)
                sq += jnp.sum(g_scale * g_scale, axis=1)
                sq += jnp.sum(g_bias * g_bias, axis=1)
            else:  # pragma: no cover
                raise ValueError(f"unknown DP layer kind: {kind}")
        norms = jnp.sqrt(sq)
        scale = jnp.minimum(1.0, max_grad_norm / jnp.maximum(norms, 1e-12))
        scale = scale * jnp.asarray(wmask, jnp.float32)

        # pass 2: clipped masked sum via the reweighted loss
        def weighted_loss(p):
            logits = module.apply({"params": p, **extra}, xb, train=True,
                                  rngs=rngs)
            return jnp.sum(per_example_losses(logits, yb)
                           * jax.lax.stop_gradient(scale))

        clipped_sum = jax.grad(weighted_loss)(params)
        mean_grad = jax.tree.map(lambda g: g / batch, clipped_sum)

        # noise: identical stream discipline to make_dp_sgd_grad_fn
        sigma = noise_multiplier * max_grad_norm / batch
        leaves, treedef = jax.tree.flatten(mean_grad)
        keys = jax.random.split(noise_key, len(leaves))
        noisy = [
            g + sigma * jax.random.normal(k, g.shape, g.dtype)
            for g, k in zip(leaves, keys)
        ]
        return jax.tree.unflatten(treedef, noisy)

    return dp_grad


def model_supports_ghost_dp(model) -> bool:
    """True when the model's module declares the ghost-norm instrumentation
    contract (``DP_LAYERS`` + dp_capture/dp_perturb kwargs). DP_LAYERS may
    be a property returning None for configurations that are not DP-sound
    (e.g. CIFAR10CNN with BatchNorm)."""
    return bool(getattr(getattr(model, "module", None), "DP_LAYERS", None))


# ---------------------------------------------------------------------------
# Host-side budget tracking + engine (ref API surface)
# ---------------------------------------------------------------------------

class PrivacyBudgetTracker:
    """Additive (ε, δ) budget ledger
    (ref: PrivacyBudgetTracker, src/shared/privacy.py:25-92)."""

    def __init__(self, initial_epsilon: float, initial_delta: float):
        self.initial_epsilon = initial_epsilon
        self.initial_delta = initial_delta
        self.consumed_epsilon = 0.0
        self.consumed_delta = 0.0
        self.consumption_history: List[Dict[str, Any]] = []
        self.start_time = time.time()

    def consume_budget(self, epsilon: float, delta: float,
                       operation: str = "training") -> None:
        self.consumed_epsilon += epsilon
        self.consumed_delta += delta
        self.consumption_history.append({
            "timestamp": time.time(),
            "epsilon": epsilon,
            "delta": delta,
            "operation": operation,
            "total_epsilon": self.consumed_epsilon,
            "total_delta": self.consumed_delta,
        })

    def get_remaining_budget(self) -> Tuple[float, float]:
        return (
            max(0.0, self.initial_epsilon - self.consumed_epsilon),
            max(0.0, self.initial_delta - self.consumed_delta),
        )

    def is_budget_exhausted(self, required_epsilon: float = 0.0,
                            required_delta: float = 0.0) -> bool:
        # small relative tolerance so k rounds of budget/k sum cleanly
        # despite float accumulation
        rem_e, rem_d = self.get_remaining_budget()
        tol_e = 1e-9 * max(self.initial_epsilon, 1.0)
        tol_d = 1e-9 * max(self.initial_delta, 1e-12)
        return rem_e < required_epsilon - tol_e or rem_d < required_delta - tol_d

    def get_budget_status(self) -> Dict[str, Any]:
        rem_e, rem_d = self.get_remaining_budget()
        return {
            "initial_epsilon": self.initial_epsilon,
            "initial_delta": self.initial_delta,
            "consumed_epsilon": self.consumed_epsilon,
            "consumed_delta": self.consumed_delta,
            "remaining_epsilon": rem_e,
            "remaining_delta": rem_d,
            "epsilon_utilization": (
                self.consumed_epsilon / self.initial_epsilon
                if self.initial_epsilon else 0.0
            ),
            "delta_utilization": (
                self.consumed_delta / self.initial_delta
                if self.initial_delta else 0.0
            ),
            "operations_count": len(self.consumption_history),
            "tracking_duration": time.time() - self.start_time,
        }

    # state for checkpoint/resume (orbax stores this dict)
    def state_dict(self) -> Dict[str, Any]:
        return {
            "initial_epsilon": self.initial_epsilon,
            "initial_delta": self.initial_delta,
            "consumed_epsilon": self.consumed_epsilon,
            "consumed_delta": self.consumed_delta,
        }

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        self.initial_epsilon = state["initial_epsilon"]
        self.initial_delta = state["initial_delta"]
        self.consumed_epsilon = state["consumed_epsilon"]
        self.consumed_delta = state["consumed_delta"]


class GradientClipper:
    """Host facade over the device clip (ref: GradientClipper,
    privacy.py:95-168)."""

    def __init__(self, max_grad_norm: float):
        self.max_grad_norm = max_grad_norm

    def clip_gradients(self, gradients: Any) -> Tuple[Any, float]:
        tree = jax.tree.map(jnp.asarray, dict(gradients))
        clipped, sens = pt.clip_by_global_norm(tree, self.max_grad_norm)
        return clipped, float(sens)

    def estimate_sensitivity(self, gradients_batch: List[Any]) -> float:
        """Max global norm across a batch of gradient dicts
        (ref: privacy.py:146-168)."""
        if not gradients_batch:
            return 0.0
        return max(
            float(pt.global_norm(jax.tree.map(jnp.asarray, dict(g))))
            for g in gradients_batch
        )


class GaussianNoiseGenerator:
    """Gaussian-mechanism noise (ref: GaussianNoiseGenerator,
    privacy.py:171-254), keyed by an explicit PRNG key instead of global
    torch RNG state."""

    def __init__(self, key: Optional[jax.Array] = None):
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def generate_noise(self, shape, sensitivity: float, epsilon: float,
                       delta: float) -> jax.Array:
        if epsilon <= 0:
            raise PrivacyError("Epsilon must be positive")
        if delta <= 0 or delta >= 1:
            raise PrivacyError("Delta must be in (0, 1)")
        sigma = gaussian_sigma(sensitivity, epsilon, delta)
        return sigma * jax.random.normal(self._next_key(), shape, jnp.float32)

    def add_noise_to_gradients(self, gradients: Any, sensitivity: float,
                               epsilon: float, delta: float) -> Any:
        tree = jax.tree.map(jnp.asarray, dict(gradients))
        sigma = gaussian_sigma(sensitivity, epsilon, delta)
        leaves, treedef = jax.tree.flatten(tree)
        keys = jax.random.split(self._next_key(), len(leaves))
        noisy_leaves = [
            leaf + sigma * jax.random.normal(k, leaf.shape, jnp.float32).astype(leaf.dtype)
            for leaf, k in zip(leaves, keys)
        ]
        return jax.tree.unflatten(treedef, noisy_leaves)


class DifferentialPrivacyEngine:
    """Host DP engine mirroring the reference
    (ref: DifferentialPrivacyEngine, privacy.py:257-416): validate →
    budget-check → clip → noise with sensitivity = clipped norm → consume."""

    def __init__(self, privacy_config: PrivacyConfig,
                 key: Optional[jax.Array] = None):
        self.config = privacy_config
        self.clipper = GradientClipper(privacy_config.max_grad_norm)
        self.noise_generator = GaussianNoiseGenerator(key)
        self.budget_tracker = PrivacyBudgetTracker(
            privacy_config.epsilon, privacy_config.delta
        )

    def add_noise(self, gradients: Any, epsilon: float, delta: float) -> Any:
        if not validate_privacy_parameters(epsilon, delta):
            raise PrivacyError("Invalid privacy parameters")
        if self.budget_tracker.is_budget_exhausted(epsilon, delta):
            raise PrivacyError("Privacy budget exhausted")
        clipped, actual_norm = self.clipper.clip_gradients(gradients)
        noisy = self.noise_generator.add_noise_to_gradients(
            clipped, actual_norm, epsilon, delta
        )
        self.budget_tracker.consume_budget(epsilon, delta, "gradient_noise")
        return noisy

    def clip_gradients(self, gradients: Any, max_norm: float) -> Any:
        clipped, _ = GradientClipper(max_norm).clip_gradients(gradients)
        return clipped

    def calculate_privacy_budget(self, epsilon: float, delta: float,
                                 steps: int) -> float:
        return advanced_composition_epsilon(epsilon, delta, steps)

    def validate_privacy_parameters(self, epsilon: float, delta: float) -> bool:
        return validate_privacy_parameters(epsilon, delta)

    def get_privacy_analysis(self) -> Dict[str, Any]:
        """ref: get_privacy_analysis, privacy.py:358-402."""
        strength_order = ["strong", "moderate", "weak"]
        eps_strength = ("strong" if self.config.epsilon < 1.0
                        else "moderate" if self.config.epsilon < 5.0 else "weak")
        delta_strength = ("strong" if self.config.delta < 1e-5
                          else "moderate" if self.config.delta < 1e-3 else "weak")
        recommendations = []
        if self.config.epsilon > 5.0:
            recommendations.append("Consider reducing epsilon for stronger privacy")
        if self.config.delta > 1e-3:
            recommendations.append("Consider reducing delta for better privacy guarantees")
        if self.config.max_grad_norm > 10.0:
            recommendations.append("Consider reducing gradient clipping norm")
        rem_e, _ = self.budget_tracker.get_remaining_budget()
        if rem_e < self.config.epsilon * 0.1:
            recommendations.append("Privacy budget nearly exhausted")
        if not recommendations:
            recommendations.append("Privacy configuration looks good")
        return {
            "privacy_config": {
                "epsilon": self.config.epsilon,
                "delta": self.config.delta,
                "max_grad_norm": self.config.max_grad_norm,
                "noise_multiplier": self.config.noise_multiplier,
            },
            "budget_status": self.budget_tracker.get_budget_status(),
            "privacy_strength": {
                "epsilon_strength": eps_strength,
                "delta_strength": delta_strength,
                "overall_strength": max(
                    eps_strength, delta_strength, key=strength_order.index
                ),
            },
            "recommendations": recommendations,
        }

    def reset_budget(self, new_epsilon: Optional[float] = None,
                     new_delta: Optional[float] = None) -> None:
        epsilon = new_epsilon or self.config.epsilon
        delta = new_delta or self.config.delta
        self.budget_tracker = PrivacyBudgetTracker(epsilon, delta)
        if new_epsilon:
            self.config.epsilon = new_epsilon
        if new_delta:
            self.config.delta = new_delta


class PrivacyAccountant:
    """Mechanism ledger with additive composition
    (ref: PrivacyAccountant, privacy.py:419-484)."""

    def __init__(self):
        self.privacy_ledger: List[Dict[str, Any]] = []
        self.total_epsilon = 0.0
        self.total_delta = 0.0

    def add_mechanism(self, mechanism_type: str, epsilon: float, delta: float,
                      sensitivity: float, noise_scale: float,
                      metadata: Optional[Dict[str, Any]] = None) -> None:
        self.privacy_ledger.append({
            "timestamp": time.time(),
            "mechanism_type": mechanism_type,
            "epsilon": epsilon,
            "delta": delta,
            "sensitivity": sensitivity,
            "noise_scale": noise_scale,
            "metadata": metadata or {},
        })
        self.total_epsilon += epsilon
        self.total_delta += delta

    def get_total_privacy_cost(self) -> Tuple[float, float]:
        return self.total_epsilon, self.total_delta

    def get_privacy_ledger(self) -> List[Dict[str, Any]]:
        return list(self.privacy_ledger)

    def export_ledger(self, filepath: str) -> None:
        with open(filepath, "w") as f:
            json.dump({
                "total_epsilon": self.total_epsilon,
                "total_delta": self.total_delta,
                "ledger": self.privacy_ledger,
            }, f, indent=2)


def create_privacy_engine(
    epsilon: float = 1.0,
    delta: float = 1e-5,
    max_grad_norm: float = 1.0,
    noise_multiplier: float = 1.0,
    key: Optional[jax.Array] = None,
) -> DifferentialPrivacyEngine:
    """Factory (ref: create_privacy_engine, privacy.py:487-512)."""
    return DifferentialPrivacyEngine(
        PrivacyConfig(epsilon=epsilon, delta=delta, max_grad_norm=max_grad_norm,
                      noise_multiplier=noise_multiplier),
        key=key,
    )


def estimate_privacy_parameters(
    target_accuracy: float = 0.9,
    dataset_size: int = 10_000,
    num_rounds: int = 100,
) -> Dict[str, float]:
    """Heuristic parameter suggestion
    (ref: estimate_privacy_parameters, privacy.py:515-557)."""
    base_epsilon = 1.0 if dataset_size > 5000 else 2.0
    if target_accuracy > 0.95:
        epsilon = base_epsilon * 2
    elif target_accuracy < 0.85:
        epsilon = base_epsilon * 0.5
    else:
        epsilon = base_epsilon
    epsilon = epsilon / math.sqrt(num_rounds)
    return {
        "epsilon": epsilon,
        "delta": 1.0 / dataset_size,
        "max_grad_norm": 1.0 if target_accuracy > 0.9 else 2.0,
        "noise_multiplier": 1.0,
    }
