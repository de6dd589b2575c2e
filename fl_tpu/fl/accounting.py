"""Rényi-DP (moments) accounting for subsampled-Gaussian DP-SGD.

The reference ships only naive additive composition (PrivacyAccountant,
src/shared/privacy.py:419-484 — "in practice you'd use more sophisticated
bounds like RDP", privacy.py:464-465). This module is that sophisticated
bound: the standard RDP accountant for the Poisson-subsampled Gaussian
mechanism (Abadi et al. 2016 moments accountant via Mironov 2017 RDP),
which is what makes the north-star "91%+ MNIST at ε = 1.0" achievable —
per-step noise z·C/B composed over thousands of steps yields single-digit ε
instead of the additive ledger's thousands.

Implementation: integer-order RDP of the subsampled Gaussian via the
binomial expansion bound

    RDP(α) ≤ 1/(α−1) · log Σ_{k=0..α} C(α,k)(1−q)^{α−k} q^k · e^{k(k−1)/(2σ²)}

valid for integer α ≥ 2 (the classic tensorflow-privacy formula), composed
linearly over steps, then converted with ε = min_α [RDP(α)·T + log(1/δ)/(α−1)].
Pure-host math (log-space, numpy) — accounting is control-plane.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Sequence, Tuple

import numpy as np

DEFAULT_ALPHAS: Tuple[int, ...] = tuple(range(2, 65)) + (128, 256, 512)


def _log_comb(n: int, k: int) -> float:
    return (math.lgamma(n + 1) - math.lgamma(k + 1)
            - math.lgamma(n - k + 1))


def rdp_subsampled_gaussian(
    q: float, noise_multiplier: float,
    alphas: Sequence[int] = DEFAULT_ALPHAS,
) -> np.ndarray:
    """Per-step RDP(α) of the Poisson-subsampled Gaussian mechanism with
    sampling rate ``q`` and noise σ = noise_multiplier (sensitivity 1)."""
    if noise_multiplier <= 0:
        return np.full(len(alphas), np.inf)
    if q <= 0:
        return np.zeros(len(alphas))
    if q > 1:
        raise ValueError("sampling rate q must be in (0, 1]")
    sigma2 = noise_multiplier ** 2
    out = []
    for alpha in alphas:
        if q == 1.0:
            out.append(alpha / (2 * sigma2))
            continue
        # log-sum-exp over the binomial expansion
        log_terms = [
            _log_comb(alpha, k)
            + (alpha - k) * math.log1p(-q)
            + k * math.log(q)
            + (k * (k - 1)) / (2 * sigma2)
            for k in range(alpha + 1)
        ]
        m = max(log_terms)
        log_sum = m + math.log(sum(math.exp(t - m) for t in log_terms))
        out.append(log_sum / (alpha - 1))
    return np.asarray(out)


def eps_from_rdp(
    rdp: np.ndarray, delta: float,
    alphas: Sequence[int] = DEFAULT_ALPHAS,
) -> Tuple[float, int]:
    """Convert accumulated RDP to (ε, best α) at the given δ."""
    if delta <= 0 or delta >= 1:
        raise ValueError("delta must be in (0, 1)")
    alphas_arr = np.asarray(alphas, np.float64)
    eps = rdp + math.log(1.0 / delta) / (alphas_arr - 1)
    idx = int(np.argmin(eps))
    return float(eps[idx]), int(alphas_arr[idx])


def compute_epsilon(
    steps: int, q: float, noise_multiplier: float, delta: float,
    alphas: Sequence[int] = DEFAULT_ALPHAS,
) -> float:
    """Total ε after ``steps`` DP-SGD steps."""
    if steps <= 0:
        return 0.0
    rdp = rdp_subsampled_gaussian(q, noise_multiplier, alphas) * steps
    return eps_from_rdp(rdp, delta, alphas)[0]


def calibrate_noise_multiplier(
    target_epsilon: float, delta: float, q: float, steps: int,
    z_lo: float = 0.3, z_hi: float = 64.0, tol: float = 1e-3,
) -> float:
    """Binary-search the smallest z whose ε(steps) ≤ target
    (tf-privacy's calibration recipe)."""
    if compute_epsilon(steps, q, z_hi, delta) > target_epsilon:
        raise ValueError(
            f"target ε={target_epsilon} unreachable even at z={z_hi}"
        )
    if compute_epsilon(steps, q, z_lo, delta) <= target_epsilon:
        return z_lo
    lo, hi = z_lo, z_hi
    while hi - lo > tol:
        mid = 0.5 * (lo + hi)
        if compute_epsilon(steps, q, mid, delta) > target_epsilon:
            lo = mid
        else:
            hi = mid
    return hi


@dataclass
class RDPAccountant:
    """Stateful accountant: accumulate heterogeneous steps, query ε.

    Drop-in upgrade over the naive ledger (fl_tpu.fl.privacy
    PrivacyAccountant) for DP-SGD mode.
    """

    alphas: Sequence[int] = DEFAULT_ALPHAS
    _rdp: np.ndarray = field(default=None)  # type: ignore[assignment]

    def __post_init__(self):
        if self._rdp is None:
            self._rdp = np.zeros(len(self.alphas))

    def step(self, q: float, noise_multiplier: float,
             num_steps: int = 1) -> None:
        self._rdp = self._rdp + num_steps * rdp_subsampled_gaussian(
            q, noise_multiplier, self.alphas
        )

    def accumulate(self, rdp: np.ndarray) -> None:
        """Add a per-mechanism RDP vector computed elsewhere (same α grid)
        — e.g. the Skellam bound of fl_tpu.fl.distributed_dp. RDP composes
        additively regardless of the mechanism family."""
        rdp = np.asarray(rdp, np.float64)
        if rdp.shape != self._rdp.shape:
            raise ValueError(
                f"RDP vector has {rdp.shape[0]} orders; accountant tracks "
                f"{self._rdp.shape[0]} — compute it over the same alphas")
        self._rdp = self._rdp + rdp

    def get_epsilon(self, delta: float) -> float:
        eps, _ = eps_from_rdp(self._rdp, delta, self.alphas)
        return eps

    def get_epsilon_and_order(self, delta: float) -> Tuple[float, int]:
        return eps_from_rdp(self._rdp, delta, self.alphas)

    def state_dict(self) -> dict:
        return {"rdp": self._rdp.tolist(), "alphas": list(self.alphas)}

    def load_state_dict(self, state: dict) -> None:
        self.alphas = tuple(state["alphas"])
        self._rdp = np.asarray(state["rdp"])
