"""Distributed DP: the Skellam mechanism over modular integer aggregation.

Central-DP FedAvg (``dp_mode="client_dp"``) trusts the server to add the
noise — the server still *sees* every client's clipped delta. Distributed DP
removes that trust: each client quantizes its clipped delta to an integer
grid, adds its own share of integer noise, and ships only integers mod 2^32,
so the release the server decodes — the MODULAR SUM — is already
differentially private *before* the server touches it. Because everything is
exact integer arithmetic, the mechanism composes LOSSLESSLY with the
mod-2^32 secure-aggregation masking (``fl_tpu.services.secagg_wire`` on the
wire; :func:`masked_integer_payloads` on-chip): masks cancel bit-exactly, so
"the server only ever learns the noisy sum" holds cryptographically, not
just procedurally.

Mechanism (Agarwal, Kairouz, Liu — "The Skellam Mechanism for Differentially
Private Federated Learning", NeurIPS 2021):

1. clip the client delta to L2 norm ``c`` (float), scale by ``1/γ``,
2. stochastically round to the integer lattice (unbiased; error < 1 per
   coordinate, so the INTEGER L2 sensitivity is ``Δ₂ = c/γ + √d``,
   deterministically),
3. add per-coordinate Skellam noise ``Sk(μ/n) = Pois(μ/2n) − Pois(μ/2n)``,
4. sum mod 2^32 across the ``n`` participants. Skellam is CLOSED under
   addition — the sum carries exactly ``Sk(μ)`` — so per-client noise shares
   compose into the full central guarantee with zero distributional slack
   (the discrete-Gaussian alternative loses a divergence term here).

Why Skellam on TPU: sampling is two ``jax.random.poisson`` draws — fixed
shape, no rejection loop in user code, vmappable over the client axis — and
the modular pipeline is int32 two's-complement arithmetic end to end (adds
mod 2^32 natively, and the final bitcast-to-signed decode is exact while the
true sum stays inside ±2^31, which :func:`check_no_wraparound` certifies at
config time).

Accounting: Rényi DP of the shifted Skellam (closed-form bound
:func:`skellam_rdp`, validated in tests against the EXACT Rényi divergence
:func:`skellam_renyi_divergence_exact`, computed from the Bessel-function
pmf), composed per round by the engine's RDP accountant with the REALIZED
participant count and no subsampling amplification (q=1 — conservative;
amplification under secagg dropout is an open problem, so we don't claim
it).

The reference has no distributed-DP (or any secure-aggregation) capability —
its DP is client-local Gaussian noise on plaintext uploads
(/root/reference/src/shared/privacy.py:100-180, federated_trainer.py:
471-526); this module is an fl_tpu capability extension.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fl_tpu.fl.accounting import DEFAULT_ALPHAS, eps_from_rdp

MOD = 2 ** 32


# ===========================================================================
# Host-side: plan, sensitivity, accounting
# ===========================================================================

@dataclass(frozen=True)
class DistributedDPPlan:
    """Static parameters of one distributed-DP deployment, derived once at
    engine-config time from (clip norm, grid bits, model dim, cohort)."""

    clip_norm: float      # c: float L2 clip
    bits: int             # grid resolution: gamma = c / 2^bits
    dim: int              # d: REAL (unpadded) flat parameter count
    expected_clients: int  # m̄: fixed denominator + noise-split target
    noise_multiplier: float  # z: central noise std = z·Δ₂ grid units

    @property
    def gamma(self) -> float:
        return self.clip_norm / float(2 ** self.bits)

    @property
    def delta2(self) -> float:
        """Integer L2 sensitivity: grid-scaled clip + the deterministic
        stochastic-rounding inflation. Each coordinate errs by < 1 in
        exact arithmetic; the on-chip f32 add x/γ + u can round the sum by
        one ulp at magnitude 2^bits, so the per-coordinate bound is
        1 + 2^(bits−23) — the certification slack must not hide a
        sensitivity underestimate."""
        per_coord = 1.0 + 2.0 ** (self.bits - 23)
        return float(2 ** self.bits) + per_coord * math.sqrt(self.dim)

    @property
    def delta1(self) -> float:
        """Integer L1 sensitivity bound (Cauchy–Schwarz from Δ₂)."""
        return math.sqrt(self.dim) * self.delta2

    @property
    def mu_central(self) -> float:
        """Target variance of the summed noise, grid units: (z·Δ₂)²."""
        return (self.noise_multiplier * self.delta2) ** 2

    @property
    def mu_local(self) -> float:
        """Per-client Skellam variance: each of m̄ expected participants
        contributes Sk(μ_central/m̄); closure makes the realized sum
        Sk(m·μ_central/m̄)."""
        return self.mu_central / max(1, self.expected_clients)

    def central_sigma_float(self, realized: int) -> float:
        """Std of the noise on the DECODED AVERAGE delta, float units,
        given the realized participant count."""
        mu = self.mu_local * max(0, realized)
        return self.gamma * math.sqrt(mu) / max(1, self.expected_clients)

    def round_rdp(self, realized: int,
                  alphas: Sequence[int] = DEFAULT_ALPHAS) -> np.ndarray:
        """Per-round RDP vector at the realized participant count."""
        if realized <= 0:
            # no participant data entered the release: the sum is the
            # deterministic zero vector — nothing to account
            return np.zeros(len(alphas))
        return skellam_rdp(self.mu_local * realized, self.delta2,
                           self.delta1, alphas)


def skellam_rdp(mu: float, delta2: float, delta1: float,
                alphas: Sequence[int] = DEFAULT_ALPHAS) -> np.ndarray:
    """RDP(α) upper bound of the multidimensional Skellam mechanism with
    per-coordinate noise variance ``mu``, integer L2 sensitivity ``delta2``
    and L1 sensitivity ``delta1`` (Agarwal et al. 2021, Thm. 3.3):

        ε(α) ≤ α·Δ₂²/(2μ) + min( ((2α−1)·Δ₂² + 6·Δ₁)/(4μ²),  3·Δ₁/(2μ²) )

    The first term is the Gaussian-mechanism rate (Skellam → Gaussian as
    μ/Δ² → ∞); the correction vanishes as 1/μ². The bound — including the
    constants — is validated against the numerically EXACT Rényi divergence
    across the operating regime in tests/test_distributed_dp.py; at the
    engine's default bits=14 the correction is < 1e-4 of the Gaussian term,
    so a constant-factor error there could not materially affect ε.
    """
    if mu <= 0:
        return np.full(len(alphas), np.inf)
    a = np.asarray(alphas, np.float64)
    gauss = a * delta2 ** 2 / (2.0 * mu)
    corr = np.minimum(
        ((2.0 * a - 1.0) * delta2 ** 2 + 6.0 * delta1) / (4.0 * mu ** 2),
        3.0 * delta1 / (2.0 * mu ** 2),
    )
    return gauss + corr


def _skellam_log_pmf(k: np.ndarray, mu: float) -> np.ndarray:
    """Exact log pmf of Sk(μ) = Pois(μ/2) − Pois(μ/2) at integer points
    ``k``, computed entirely in log space (no Bessel underflow):

        log pmf(k) = −μ + logsumexp_j [(|k|+2j)·log(μ/2)
                                       − lgamma(|k|+j+1) − lgamma(j+1)]

    The inner series peaks at j* = (−|k| + √(k²+μ²))/2 with ~√j* width; a
    j-window of ±(12√(j*+1)+60) around it keeps the sum exact to double
    precision at any scale the certification tests reach.
    """
    from scipy.special import gammaln, logsumexp

    k = np.abs(np.asarray(k, np.int64))
    half = mu / 2.0
    jstar = 0.5 * (-k + np.sqrt(k.astype(np.float64) ** 2 + mu ** 2))
    width = (12.0 * np.sqrt(jstar + 1.0) + 60.0).astype(np.int64)
    j0 = np.maximum(0, (jstar - width).astype(np.int64))
    wmax = int((2 * width).max()) + 1
    j = j0[:, None] + np.arange(wmax)[None, :]          # (K, W)
    terms = ((k[:, None] + 2 * j) * math.log(half)
             - gammaln(k[:, None] + j + 1.0) - gammaln(j + 1.0))
    return -mu + logsumexp(terms, axis=1)


def skellam_renyi_divergence_exact(mu: float, shift: int,
                                   alpha: float) -> float:
    """Numerically exact D_α( Sk(μ)+shift ‖ Sk(μ) ) for a 1-D integer shift.

    The Rényi integrand Q(k−δ)^α Q(k)^{1−α} peaks near k ≈ α·δ (far outside
    the pmf's bulk for large α), so everything runs in exact log space via
    :func:`_skellam_log_pmf`. Used by the accounting-certification tests —
    NOT in the production path (scipy imported lazily).
    """
    if shift == 0:
        return 0.0
    shift = abs(int(shift))
    w = int(40.0 * math.sqrt(mu) + 10 * shift + 50)
    center = int(alpha * shift)
    k = np.arange(min(0, center) - w, max(0, center) + w + 1)
    lq = _skellam_log_pmf(k, mu)
    lp = _skellam_log_pmf(k - shift, mu)
    t = alpha * lp + (1.0 - alpha) * lq
    m = np.max(t)
    log_sum = m + math.log(np.sum(np.exp(t - m)))
    return float(log_sum / (alpha - 1.0))


def distributed_epsilon(plan: DistributedDPPlan, rounds: int,
                        delta: float,
                        realized: int = None) -> float:
    """Total (ε, δ)-DP after ``rounds`` full-participation rounds (or at an
    explicit realized count) — the host-side calibration helper."""
    m = plan.expected_clients if realized is None else realized
    rdp = plan.round_rdp(m) * rounds
    return eps_from_rdp(rdp, delta)[0]


def calibrate_noise_multiplier(
    target_epsilon: float, delta: float, rounds: int,
    clip_norm: float, bits: int, dim: int, expected_clients: int,
    z_lo: float = 0.05, z_hi: float = 256.0, tol: float = 1e-3,
) -> float:
    """Smallest z whose total ε over ``rounds`` rounds fits the target."""
    def eps_at(z: float) -> float:
        plan = DistributedDPPlan(clip_norm, bits, dim, expected_clients, z)
        return distributed_epsilon(plan, rounds, delta)

    if eps_at(z_hi) > target_epsilon:
        raise ValueError(f"ε={target_epsilon} unreachable even at z={z_hi}")
    if eps_at(z_lo) <= target_epsilon:
        return z_lo
    lo, hi = z_lo, z_hi
    while hi - lo > tol:
        mid = 0.5 * (lo + hi)
        if eps_at(mid) > target_epsilon:
            lo = mid
        else:
            hi = mid
    return hi


def check_no_wraparound(plan: DistributedDPPlan, num_clients: int) -> None:
    """Certify the true integer sum stays inside ±2^31 so the signed decode
    is exact: worst-case data mass + a 12σ noise tail."""
    data = num_clients * (2 ** plan.bits + 1)
    noise = 12.0 * math.sqrt(plan.mu_local * num_clients)
    if data + noise >= 2 ** 31:
        raise ValueError(
            f"distributed-DP overflow risk: {num_clients} clients at "
            f"bits={plan.bits}, z={plan.noise_multiplier} put the sum's "
            f"12σ envelope at {data + noise:.3g} ≥ 2^31; lower dist_bits "
            "or the client count")


# ===========================================================================
# Device-side: the integer pipeline (jit/vmap/shard_map-safe)
# ===========================================================================

def stochastic_round(mat: jax.Array, gamma: float,
                     keys: jax.Array) -> jax.Array:
    """(C, D) f32 → int32 lattice, unbiased: floor(x/γ + U[0,1)).

    Exact zeros (padding lanes, untouched coordinates) round to exactly 0.
    Per-client keys so the rounding randomness is mesh-layout-invariant.
    """
    def one(row, key):
        u = jax.random.uniform(key, row.shape, jnp.float32)
        return jnp.floor(row / jnp.float32(gamma) + u).astype(jnp.int32)

    return jax.vmap(one)(mat, keys)


def skellam_noise(keys: jax.Array, lam: float, dim: int) -> jax.Array:
    """(C, dim) int32 Skellam Sk(2·lam) draws: Pois(lam) − Pois(lam),
    one key per client row."""
    def one(key):
        k1, k2 = jax.random.split(key)
        n1 = jax.random.poisson(k1, jnp.float32(lam), (dim,), jnp.int32)
        n2 = jax.random.poisson(k2, jnp.float32(lam), (dim,), jnp.int32)
        return n1 - n2

    return jax.vmap(one)(keys)


def aggregate_skellam_noise(key: jax.Array, lam_total,
                            dim: int) -> jax.Array:
    """(dim,) int32 Sk(2·lam_total) draw — the EXACT distribution of the
    summed per-client shares (Skellam closure: Σ_m Sk(μ/m̄) = Sk(m·μ/m̄)),
    sampled once on the aggregate instead of per client. The simulation
    engine uses this by default (``dist_fuse_noise=True``): the released
    sum is distributionally identical while the Poisson sampling cost
    drops from 2·C·D draws to 2·D. ``lam_total`` may be traced (it scales
    with the realized participant count)."""
    k1, k2 = jax.random.split(key)
    lam = jnp.asarray(lam_total, jnp.float32)
    n1 = jax.random.poisson(k1, lam, (dim,), jnp.int32)
    n2 = jax.random.poisson(k2, lam, (dim,), jnp.int32)
    return n1 - n2


def client_integer_payloads(mat: jax.Array, mask: jax.Array,
                            keys: jax.Array, gamma: float,
                            mu_local: float) -> jax.Array:
    """Each participant's int32 wire payload: round(clipped/γ) + Sk(μ_local).
    Non-participants contribute exact zeros. int32 two's-complement wrap IS
    arithmetic mod 2^32, so downstream sums/masks need no special casing.
    """
    rk = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
    nk = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
    ints = stochastic_round(mat, gamma, rk)
    ints = ints + skellam_noise(nk, mu_local / 2.0, mat.shape[1])
    return ints * mask.astype(jnp.int32)[:, None]


def decode_average(total_int: jax.Array, gamma: float,
                   expected_clients: int) -> jax.Array:
    """Modular int32 sum → float average delta against the FIXED expected
    denominator (same sensitivity convention as client_dp's q·N mean)."""
    return (total_int.astype(jnp.float32) * jnp.float32(gamma)
            / jnp.float32(max(1, expected_clients)))


def pairwise_integer_masks(key: jax.Array, num_clients: int, dim: int,
                           neighbors: int = 8,
                           alive: jax.Array = None) -> jax.Array:
    """(C, D) int32 pairwise masks over a ring graph that cancel BIT-EXACTLY
    mod 2^32 (contrast fl.secure_agg's float masks, which cancel only to
    ~C·eps·scale). Uniform over the full ring Z_2^32 ⇒ each masked payload
    is marginally uniform: perfect hiding."""
    C, D = num_clients, dim
    k = min(neighbors, max(C - 1, 0))
    if alive is None:
        alive = jnp.ones((C,), jnp.float32)
    live = (alive > 0).astype(jnp.int32)
    masks = jnp.zeros((C, D), jnp.int32)
    for o in range(1, k + 1):
        okey = jax.random.fold_in(key, o)
        pair_keys = jax.vmap(lambda i, ok=okey: jax.random.fold_in(ok, i))(
            jnp.arange(C))
        noise = jax.vmap(
            lambda pk: jax.random.bits(pk, (D,), jnp.uint32)
        )(pair_keys).astype(jnp.int32)  # bitcast-free: same 2^32 ring
        both = live * jnp.roll(live, -o)
        noise = noise * both[:, None]
        masks = masks + noise - jnp.roll(noise, o, axis=0)
    return masks


# ===========================================================================
# Host-side pipeline for WIRE clients (numpy; composes with the Bonawitz
# protocol in fl_tpu.services.secagg_wire via mask_integer_payload /
# unmask_integer_sum)
# ===========================================================================

def host_client_integer_payload(
        weights: dict, plan: DistributedDPPlan,
        rng: np.random.Generator) -> dict:
    """One wire client's distributed-DP payload: clip the CONCATENATED
    delta to the plan's L2 norm, γ-grid stochastic-round, add this
    client's Skellam share — returned as per-layer uint32 arrays ready for
    :meth:`SecAggClientSession.mask_integer_payload` (sorted-key layout
    matches the wire protocol's)."""
    keys = sorted(weights.keys())
    flats = [np.asarray(weights[k], np.float64).ravel() for k in keys]
    flat = np.concatenate(flats)
    norm = float(np.linalg.norm(flat))
    if norm > plan.clip_norm:
        flat = flat * (plan.clip_norm / norm)
    scaled = flat / plan.gamma
    ints = np.floor(scaled + rng.random(flat.size)).astype(np.int64)
    lam = plan.mu_local / 2.0
    ints += rng.poisson(lam, flat.size) - rng.poisson(lam, flat.size)
    u32 = (ints % MOD).astype(np.uint32)
    out, offset = {}, 0
    for k in keys:
        w = np.asarray(weights[k])
        out[k] = u32[offset: offset + w.size].reshape(w.shape)
        offset += w.size
    return out


def host_decode_average(summed_u32: dict, plan: DistributedDPPlan) -> dict:
    """Decode the unmasked mod-2^32 per-layer sums (server side): centered
    signed interpretation × γ / m̄ — the average delta under the FIXED
    expected denominator, float32 per layer."""
    out = {}
    for k, v in summed_u32.items():
        s = np.asarray(v, np.uint32).astype(np.int64)
        s = np.where(s >= 2 ** 31, s - MOD, s)
        out[k] = (s.astype(np.float64) * plan.gamma
                  / max(1, plan.expected_clients)).astype(np.float32)
    return out


def masked_integer_payloads(mat: jax.Array, mask: jax.Array,
                            keys: jax.Array, round_key: jax.Array,
                            gamma: float, mu_local: float,
                            neighbors: int = 8) -> jax.Array:
    """What an on-chip secure aggregator would SEE per client: the integer
    payload plus exactly-cancelling pairwise masks — marginally uniform on
    Z_2^32, summing (mod 2^32) to the same total as the unmasked payloads.
    Inspection/test surface; the engine computes the sum directly because
    the masks are an algebraic no-op on it."""
    ints = client_integer_payloads(mat, mask, keys, gamma, mu_local)
    return ints + pairwise_integer_masks(
        round_key, mat.shape[0], mat.shape[1], neighbors, alive=mask)
