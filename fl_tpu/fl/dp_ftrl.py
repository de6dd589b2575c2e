"""DP-FTRL: client-level DP via binary-tree noise — no sampling required.

Kairouz et al. 2021, "Practical and Private (Deep) Learning without
Sampling or Shuffling" (arXiv:2103.00039). The repo's ``client_dp`` mode
(McMahan et al. 2018) certifies its ε through *privacy amplification by
Poisson sampling* — a property real federated deployments cannot enforce
(clients come and go on their own schedule). DP-FTRL removes that
assumption: the server releases noisy PREFIX SUMS of the per-round
clipped update sums through binary-tree aggregation, and its guarantee
holds for ARBITRARY (even adversarial) participation orderings, as long
as each client contributes to at most ``k`` rounds.

Tree aggregation (Dwork et al. 2010; Chan et al. 2011): dyadic interval
nodes ``node(l, j) = rounds [j·2^l + 1, (j+1)·2^l]`` each carry one i.i.d.
N(0, σ_node²·I) draw. The prefix [1, t] decomposes into one node per set
bit of t, so the released cumulative sum

    S̃_t = Σ_{s≤t} Δ_s + Σ_{set bits l of t} noise(node(l, 2·(t >> (l+1))))

carries only popcount(t) ≤ h noise terms instead of t — the whole point:
noise in the *trajectory* grows O(√log T), not O(√T). TPU-native twist:
node noise is REGENERATED inside the jitted superstep from counter-based
PRNG keys (fold_in(tree_key, l, j)) — the tree itself is never stored,
so the carried mechanism state is just the true cumulative sum.

Privacy: releasing every node is a single Gaussian mechanism. One client
changes one leaf by ≤ C (the clip), which touches at most ``h =
⌈log2 T⌉ + 1`` nodes (its ancestors); over ≤ k participations the L2
sensitivity is ``C·√(k·h)``. Per-node noise σ_node = z·C·√(k·h) then makes
the ENTIRE T-round transcript one Gaussian mechanism with multiplier z:
ε = min_α [α/(2z²) + log(1/δ)/(α−1)] — fixed up front, no per-round
composition, no sampling assumption. The model sequence (FTRL with
linearized losses, optional momentum on the noisy increments) is
post-processing.

Reference has no DP-FTRL (its DP is per-update Gaussian with naive
accounting, src/shared/privacy.py); capability extension.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# dense α grid: fractional low orders matter for small z
_ALPHAS: Tuple[float, ...] = tuple(
    [1.0 + x / 10.0 for x in range(1, 100)]
    + list(range(11, 64))
    + [128.0, 256.0, 512.0, 1024.0]
)


def gaussian_epsilon(noise_multiplier: float, delta: float,
                     alphas: Sequence[float] = _ALPHAS) -> float:
    """Exact (ε, δ) of a single Gaussian mechanism with σ = z·Δ via the
    analytic hockey-stick curve (Balle & Wang 2018, fl_tpu.fl.pld) — the
    tight value, strictly below the RDP conversion
    min_α α/(2z²) + log(1/δ)/(α−1) this function originally reported
    (e.g. z for ε=2, δ=1e-5 drops ~11%, directly reducing the tree-node
    noise of every DP-FTRL run calibrated through here). ``alphas`` is
    retained for signature compatibility; the RDP grid is no longer
    consulted because the analytic curve dominates it at every order."""
    z = float(noise_multiplier)
    if z <= 0:
        return float("inf")
    from fl_tpu.fl.pld import analytic_gaussian_epsilon

    return analytic_gaussian_epsilon(z, delta)


def calibrate_noise_multiplier(epsilon: float, delta: float,
                               tol: float = 1e-4) -> float:
    """Smallest z with gaussian_epsilon(z, delta) ≤ ε (bisection; the map
    is monotone decreasing in z)."""
    lo, hi = 1e-3, 1.0
    while gaussian_epsilon(hi, delta) > epsilon:
        hi *= 2.0
        if hi > 1e7:
            raise ValueError("cannot calibrate noise for this (ε, δ)")
    while hi - lo > tol * hi:
        mid = 0.5 * (lo + hi)
        if gaussian_epsilon(mid, delta) <= epsilon:
            hi = mid
        else:
            lo = mid
    return hi


def tree_height(t_max: int) -> int:
    """Number of tree levels a single leaf can touch: ⌈log2 T⌉ + 1."""
    if t_max < 1:
        raise ValueError("t_max must be >= 1")
    return int(math.ceil(math.log2(t_max))) + 1 if t_max > 1 else 1


def ftrl_sensitivity(clip: float, t_max: int,
                     max_participations: int = 1) -> float:
    """L2 sensitivity of the full tree release: C·√(k·h)."""
    return clip * math.sqrt(max_participations * tree_height(t_max))


def prefix_node_count(t: int) -> int:
    """Noise terms in S̃_t — popcount(t)."""
    return bin(int(t)).count("1")


def tree_noise_prefix(tree_key: jax.Array, t: jax.Array, dim: int,
                      sigma_node: float, height: int) -> jax.Array:
    """Σ of the dyadic-cover node noises for prefix [1, t] (traced t,
    1-indexed). Statically unrolled over the ≤ height levels; a level's
    draw is masked out when its bit of t is unset, so the program is
    shape-static and identical on every mesh shard (same key ⇒ same
    noise, replicated)."""
    t = t.astype(jnp.uint32)
    total = jnp.zeros((dim,), jnp.float32)
    for level in range(height):
        has = ((t >> level) & 1) > 0
        j = (t >> (level + 1)) * 2  # dyadic node index at this level
        nkey = jax.random.fold_in(
            jax.random.fold_in(tree_key, jnp.uint32(level)), j)
        draw = sigma_node * jax.random.normal(nkey, (dim,), jnp.float32)
        total = total + jnp.where(has, draw, 0.0)
    return total


def ftrl_server_step(
    params_flat: jax.Array,       # (D,) current global params
    cumsum: jax.Array,            # (D,) true clipped-sum prefix (carried)
    prev_noisy: jax.Array,        # (D,) S̃_{t-1} (carried)
    momentum_buf: jax.Array,      # (D,) momentum state (carried)
    round_sum: jax.Array,         # (D,) this round's clipped participant sum
    tree_key: jax.Array,
    t: jax.Array,                 # 1-indexed round number (traced)
    sigma_node: float,
    height: int,
    server_lr: float,
    cohort_size: float,           # fixed m̄ denominator (not realized count)
    momentum: float,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One DP-FTRL(M) server update. Returns
    (new_params_flat, new_cumsum, new_noisy, new_momentum_buf).

    w_t = w_{t−1} + (η/m̄)·m_t with m_t = β·m_{t−1} + (S̃_t − S̃_{t−1});
    at β=0 this telescopes to w_t = w_0 + (η/m̄)·S̃_t, the paper's
    momentum-free FTRL on linearized losses (the leaves here are client
    DELTAS — descent displacements — so the server ADDS the prefix sum,
    where the paper's gradient-leaf formulation subtracts). The
    differencing and the momentum act on *released* prefix sums — pure
    post-processing."""
    new_cumsum = cumsum + round_sum
    noise = tree_noise_prefix(tree_key, t, cumsum.shape[0], sigma_node,
                              height)
    new_noisy = new_cumsum + noise
    g = new_noisy - prev_noisy
    new_m = momentum * momentum_buf + g
    new_params = params_flat + (server_lr / cohort_size) * new_m
    return new_params, new_cumsum, new_noisy, new_m


def rotation_mask(num_clients: int, round_number: int,
                  cohort_size: int) -> np.ndarray:
    """Deterministic round-robin cohort for round t — the natural DP-FTRL
    participation pattern (no sampling needed; each client participates
    once per ⌈N/m⌉ rounds)."""
    if not 0 < cohort_size <= num_clients:
        raise ValueError("cohort_size must be in [1, num_clients]")
    mask = np.zeros((num_clients,), np.float32)
    start = (round_number * cohort_size) % num_clients
    idx = (start + np.arange(cohort_size)) % num_clients
    mask[idx] = 1.0
    return mask


def max_rounds_within_participations(num_clients: int, cohort_size: int,
                                     max_participations: int) -> int:
    """Rounds the rotation schedule can run before some client would
    exceed ``max_participations``."""
    return (num_clients // cohort_size) * max_participations
