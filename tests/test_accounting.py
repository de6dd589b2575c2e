"""RDP accountant tests: known-value sanity, monotonicity, calibration,
composition vs naive additive accounting."""

import math

import numpy as np
import pytest

from fl_tpu.fl.accounting import (
    RDPAccountant,
    calibrate_noise_multiplier,
    compute_epsilon,
    eps_from_rdp,
    rdp_subsampled_gaussian,
)


def test_full_batch_gaussian_matches_closed_form():
    """q=1 reduces to the plain Gaussian mechanism: RDP(α) = α/(2σ²)."""
    rdp = rdp_subsampled_gaussian(1.0, 2.0, alphas=(2, 8, 32))
    np.testing.assert_allclose(rdp, [2 / 8, 8 / 8, 32 / 8], rtol=1e-12)


def test_subsampling_amplifies_privacy():
    """Smaller sampling rate -> smaller RDP at every order."""
    full = rdp_subsampled_gaussian(1.0, 1.0)
    sub = rdp_subsampled_gaussian(0.01, 1.0)
    assert np.all(sub <= full + 1e-12)
    assert sub[0] < full[0] * 0.1


def test_epsilon_grows_with_steps_sublinearly():
    e1 = compute_epsilon(100, q=0.01, noise_multiplier=1.0, delta=1e-5)
    e2 = compute_epsilon(400, q=0.01, noise_multiplier=1.0, delta=1e-5)
    assert e1 < e2 < 4 * e1  # composition is sub-linear (√T-ish regime)


def test_mnist_dp_sgd_regime():
    """The canonical MNIST DP-SGD setting (z≈1.1, q=256/60000, ~15k steps)
    must land at single-digit ε — the whole point of the moments
    accountant."""
    eps = compute_epsilon(15_000, q=256 / 60_000, noise_multiplier=1.1,
                          delta=1e-5)
    assert 0.5 < eps < 5.0, eps


def test_calibration_inverts_compute_epsilon():
    q, steps, delta, target = 0.02, 2000, 1e-5, 1.0
    z = calibrate_noise_multiplier(target, delta, q, steps)
    achieved = compute_epsilon(steps, q, z, delta)
    assert achieved <= target + 1e-2
    # and z is tight: slightly less noise must overshoot
    assert compute_epsilon(steps, q, z * 0.9, delta) > target


def test_calibration_unreachable_raises():
    with pytest.raises(ValueError, match="unreachable"):
        calibrate_noise_multiplier(1e-9, 1e-5, q=1.0, steps=10**6)


def test_accountant_state_roundtrip():
    a = RDPAccountant()
    a.step(q=0.01, noise_multiplier=1.0, num_steps=500)
    eps_a = a.get_epsilon(1e-5)
    b = RDPAccountant()
    b.load_state_dict(a.state_dict())
    assert b.get_epsilon(1e-5) == pytest.approx(eps_a)
    b.step(q=0.01, noise_multiplier=1.0, num_steps=500)
    assert b.get_epsilon(1e-5) > eps_a


def test_rdp_beats_naive_composition():
    """Composing 1000 small steps: the RDP bound must be orders of magnitude
    tighter than the reference's additive ledger."""
    steps, q, z, delta = 1000, 0.01, 1.0, 1e-5
    rdp_eps = compute_epsilon(steps, q, z, delta)
    # naive: per-step ε for a Gaussian with σ=z is ~√(2·ln(1.25/δ))/z,
    # additive over steps
    naive = steps * math.sqrt(2 * math.log(1.25 / delta)) / z
    assert rdp_eps < naive / 100


def test_eps_from_rdp_validates_delta():
    with pytest.raises(ValueError):
        eps_from_rdp(np.zeros(3), delta=0.0, alphas=(2, 3, 4))
