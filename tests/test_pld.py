"""PLD accountant: validity (pessimism) and tightness vs RDP.

The PLD must never under-report ε (validity) and should beat the RDP
accountant on the same mechanism (tightness — the reason it exists).
Ground truth for the Gaussian mechanism is the analytic Balle-Wang curve,
which the PLD must bracket from above within grid slack.
"""

import math

import numpy as np
import pytest

from fl_tpu.fl.accounting import (
    calibrate_noise_multiplier,
    compute_epsilon,
)
from fl_tpu.fl.pld import (
    PLDAccountant,
    analytic_gaussian_delta,
    analytic_gaussian_epsilon,
    calibrate_noise_multiplier_pld,
    compute_epsilon_pld,
    pld_gaussian,
    pld_subsampled_gaussian,
)

DT_FAST = 1e-3  # coarse grid for test speed; validity holds at any dt


class TestAnalyticGaussian:
    def test_delta_matches_known_value(self):
        # z=1, eps=0: delta = Phi(0.5) - Phi(-0.5)
        from scipy.stats import norm

        want = norm.cdf(0.5) - norm.cdf(-0.5)
        assert analytic_gaussian_delta(0.0, 1.0) == pytest.approx(want)

    def test_epsilon_inverts_delta(self):
        for z in (0.7, 1.3, 3.0):
            eps = analytic_gaussian_epsilon(z, 1e-5)
            assert analytic_gaussian_delta(eps, z) == pytest.approx(
                1e-5, rel=1e-6)

    def test_monotone_in_noise(self):
        es = [analytic_gaussian_epsilon(z, 1e-5) for z in (0.5, 1.0, 2.0, 4.0)]
        assert es == sorted(es, reverse=True)


class TestGaussianPLD:
    def test_brackets_analytic_from_above(self):
        for z in (0.8, 1.5, 4.0):
            pld = pld_gaussian(z, dt=1e-4)
            e_pld = pld.epsilon_at_delta(1e-5)
            e_true = analytic_gaussian_epsilon(z, 1e-5)
            assert e_pld >= e_true - 1e-9  # never optimistic
            assert e_pld <= e_true + 2e-3  # and tight

    def test_composition_matches_scaled_gaussian(self):
        # T Gaussians at z·√T compose to one Gaussian at z
        T, z = 64, 1.0
        composed = pld_gaussian(z * math.sqrt(T), dt=1e-4).self_compose(T)
        e_pld = composed.epsilon_at_delta(1e-5)
        e_true = analytic_gaussian_epsilon(z, 1e-5)
        assert e_true - 1e-9 <= e_pld <= e_true + 0.05

    def test_self_compose_zero_is_identity(self):
        ident = pld_gaussian(1.0, dt=DT_FAST).self_compose(0)
        assert ident.epsilon_at_delta(1e-5) == 0.0

    def test_delta_at_epsilon_decreasing(self):
        pld = pld_gaussian(1.0, dt=DT_FAST)
        ds = [pld.delta_at_epsilon(e) for e in (0.0, 0.5, 1.0, 2.0, 4.0)]
        assert ds == sorted(ds, reverse=True)
        assert all(0.0 <= d <= 1.0 for d in ds)


class TestSubsampledPLD:
    def test_tighter_than_rdp(self):
        q, T, d = 0.1, 128, 1e-5
        for z in (0.8, 1.2):
            e_pld = compute_epsilon_pld(T, q, z, d, dt=DT_FAST)
            e_rdp = compute_epsilon(T, q, z, d)
            assert e_pld < e_rdp  # the whole point
            assert e_pld > 0.25 * e_rdp  # same order of magnitude

    def test_more_steps_more_epsilon(self):
        q, z, d = 0.1, 1.0, 1e-5
        es = [compute_epsilon_pld(t, q, z, d, dt=DT_FAST)
              for t in (0, 32, 128, 512)]
        assert es[0] == 0.0
        assert es[1] < es[2] < es[3]

    def test_more_noise_less_epsilon(self):
        q, T, d = 0.1, 128, 1e-5
        es = [compute_epsilon_pld(T, q, z, d, dt=DT_FAST)
              for z in (0.6, 1.0, 2.0)]
        assert es == sorted(es, reverse=True)

    def test_q_one_equals_gaussian(self):
        rem, add = pld_subsampled_gaussian(1.0, 1.3, dt=DT_FAST)
        g = pld_gaussian(1.3, dt=DT_FAST)
        assert rem.epsilon_at_delta(1e-5) == pytest.approx(
            g.epsilon_at_delta(1e-5))
        assert add.epsilon_at_delta(1e-5) == pytest.approx(
            g.epsilon_at_delta(1e-5))

    def test_single_step_vs_rdp_single_step(self):
        # even at T=1 the PLD should not exceed RDP
        q, z, d = 0.2, 1.0, 1e-6
        assert compute_epsilon_pld(1, q, z, d, dt=1e-4) <= \
            compute_epsilon(1, q, z, d) + 1e-6

    def test_mass_is_conserved_pessimistically(self):
        rem, add = pld_subsampled_gaussian(0.1, 1.0, dt=DT_FAST)
        for p in (rem, add):
            total = float(p.pmf.sum()) + p.inf_mass
            assert total <= 1.0 + 1e-9
            assert total >= 1.0 - 1e-12  # nothing silently dropped

    def test_invalid_inputs(self):
        with pytest.raises(ValueError):
            pld_subsampled_gaussian(0.0, 1.0)
        with pytest.raises(ValueError):
            pld_subsampled_gaussian(1.5, 1.0)
        with pytest.raises(ValueError):
            pld_subsampled_gaussian(0.1, 0.0)
        with pytest.raises(ValueError):
            pld_gaussian(1.0).epsilon_at_delta(0.0)


class TestCalibration:
    def test_pld_calibrates_less_noise_than_rdp(self):
        q, T, d, eps = 0.1, 256, 1e-5, 2.0
        z_rdp = calibrate_noise_multiplier(eps, d, q, T)
        z_pld = calibrate_noise_multiplier_pld(eps, d, q, T,
                                               dt=DT_FAST, tol=5e-3)
        assert z_pld < z_rdp  # strictly better accuracy-at-ε
        # and the calibrated z actually certifies under the target
        assert compute_epsilon_pld(T, q, z_pld, d, dt=DT_FAST) <= eps + 1e-6

    def test_unreachable_target_raises(self):
        with pytest.raises(ValueError):
            calibrate_noise_multiplier_pld(1e-9, 1e-5, 0.5, 10_000,
                                           z_hi=2.0, dt=DT_FAST)


class TestPLDAccountant:
    def test_matches_compute_epsilon_for_homogeneous_steps(self):
        q, z, T, d = 0.1, 1.0, 128, 1e-5
        acc = PLDAccountant(dt=DT_FAST)
        acc.step(q, z, num_steps=T)
        assert acc.get_epsilon(d) == pytest.approx(
            compute_epsilon_pld(T, q, z, d, dt=DT_FAST), rel=1e-9)

    def test_heterogeneous_composition_bounds(self):
        # (q1,z1)×T1 then (q2,z2)×T2: total ε between max and sum of parts
        d = 1e-5
        acc = PLDAccountant(dt=DT_FAST)
        acc.step(0.1, 1.0, 64)
        acc.step(0.05, 0.8, 64)
        total = acc.get_epsilon(d)
        e1 = compute_epsilon_pld(64, 0.1, 1.0, d, dt=DT_FAST)
        e2 = compute_epsilon_pld(64, 0.05, 0.8, d, dt=DT_FAST)
        assert max(e1, e2) < total <= e1 + e2 + 1e-6

    def test_empty_accountant_is_zero(self):
        assert PLDAccountant().get_epsilon(1e-5) == 0.0

    def test_state_roundtrip(self):
        acc = PLDAccountant(dt=DT_FAST)
        acc.step(0.1, 1.0, 32)
        acc.step(0.2, 1.5, 8)
        clone = PLDAccountant()
        clone.load_state_dict(acc.state_dict())
        assert clone.get_epsilon(1e-5) == pytest.approx(
            acc.get_epsilon(1e-5))

    def test_incremental_equals_batched(self):
        a = PLDAccountant(dt=DT_FAST)
        for _ in range(16):
            a.step(0.1, 1.0)
        b = PLDAccountant(dt=DT_FAST)
        b.step(0.1, 1.0, num_steps=16)
        assert a.get_epsilon(1e-5) == pytest.approx(b.get_epsilon(1e-5))


def _tiny_dp_engine(accountant: str, epsilon: float = 2.6):
    """2-client DP-SGD engine at q=0.5 (batch 16 / shard 32), z=2.0 —
    the configuration where PLD certifies 4 steps under ε=2.6 and RDP
    only 2 (measured in test_pld parameter sweep)."""
    from fl_tpu.core.types import PrivacyConfig
    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

    splits = load_dataset("mnist", n_train_synth=64, n_test_synth=16)
    arrays = make_federated_arrays(splits, num_clients=2, strategy="iid",
                                   samples_per_client=32, seed=0)
    return FederatedRoundEngine(
        create_model("simple_cnn", dropout_rate=0.0), arrays,
        RoundEngineConfig(
            training=FederatedTrainingConfig(local_epochs=1, batch_size=16),
            dp_mode="dp_sgd",
            privacy=PrivacyConfig(epsilon=epsilon, delta=1e-5,
                                  max_grad_norm=1.0, noise_multiplier=2.0),
            max_clients=2, seed=0, dp_microbatch=8,
            accountant=accountant,
        ),
    )


class TestEnginePLDMode:
    def test_pld_budget_outlasts_rdp_budget(self):
        """The whole point of the knob: at the same (ε, δ, q, z) the PLD
        gate admits strictly more DP-SGD rounds than the RDP gate."""
        from fl_tpu.fl import privacy as dp

        eng_pld = _tiny_dp_engine("pld")
        assert eng_pld._pld_step_budget() == 4
        eng_pld.run_round()
        eng_pld.run_round()  # 4 steps spent — exactly the PLD budget
        with pytest.raises(dp.PrivacyError, match="PLD accounting"):
            eng_pld.run_round()
        # certified ε for what was actually released stays inside budget
        assert eng_pld.certified_epsilon(dt=1e-3) <= 2.6 + 1e-9

        eng_rdp = _tiny_dp_engine("rdp")
        eng_rdp.run_round()  # 2 steps: RDP ε = 2.46 ≤ 2.6
        with pytest.raises(dp.PrivacyError, match="RDP accounting"):
            eng_rdp.run_round()

    def test_certified_epsilon_pld_below_rdp(self):
        eng = _tiny_dp_engine("pld")
        eng.run_round()
        e_pld = eng.certified_epsilon(dt=1e-3)
        e_rdp = eng.rdp_accountant.get_epsilon(1e-5)
        assert 0 < e_pld < e_rdp

    def test_checkpoint_carries_pld_steps(self, tmp_path):
        from fl_tpu.orchestration.checkpoint import (
            restore_engine_checkpoint,
            save_engine_checkpoint,
        )

        a = _tiny_dp_engine("pld")
        a.run_round()
        assert a._pld_steps_taken == 2
        save_engine_checkpoint(a, str(tmp_path / "pld_ckpt"))
        b = _tiny_dp_engine("pld")
        restore_engine_checkpoint(b, str(tmp_path / "pld_ckpt"))
        assert b._pld_steps_taken == 2  # resume cannot reopen the budget

    def test_pld_requires_subsampled_gaussian_mode(self):
        from fl_tpu.core.types import PrivacyConfig
        from fl_tpu.data import load_dataset, make_federated_arrays
        from fl_tpu.models import create_model
        from fl_tpu.orchestration import (
            FederatedRoundEngine,
            RoundEngineConfig,
        )

        splits = load_dataset("mnist", n_train_synth=64, n_test_synth=16)
        arrays = make_federated_arrays(splits, num_clients=2,
                                       strategy="iid",
                                       samples_per_client=32, seed=0)
        with pytest.raises(ValueError, match="accountant='pld'"):
            FederatedRoundEngine(
                create_model("simple_cnn"), arrays,
                RoundEngineConfig(
                    dp_mode="delta",
                    privacy=PrivacyConfig(epsilon=1.0, delta=1e-5,
                                          max_grad_norm=1.0,
                                          noise_multiplier=1.0),
                    accountant="pld",
                ),
            )
        with pytest.raises(ValueError, match="expected 'rdp' or 'pld'"):
            FederatedRoundEngine(
                create_model("simple_cnn"), arrays,
                RoundEngineConfig(accountant="bogus"),
            )


class TestGridPessimismOrdering:
    def test_auto_dt_beats_rdp_at_headline_scale(self):
        """Regression: round-up slack accumulates LINEARLY over composed
        steps, so a fixed coarse grid erases the whole PLD advantage at
        many-step configs — at the MNIST headline shape (q=1/32, T=960)
        dt=1e-3 reported ε=1.22 where RDP says 1.00. The auto-sized grid
        (suggest_pld_dt) must certify strictly below RDP here."""
        q, z, T, d = 0.03125, 4.869, 960, 1e-5
        e_rdp = compute_epsilon(T, q, z, d)
        e_pld = compute_epsilon_pld(T, q, z, d)  # dt=None → step-scaled
        assert e_pld < 0.9 * e_rdp

    def test_auto_calibration_is_gate_consistent(self):
        """The z calibrated at suggest_pld_dt(ε, steps) must certify the
        full planned step count at that same grid — the invariant the
        round engine's budget gate relies on."""
        from fl_tpu.fl.pld import suggest_pld_dt

        eps, d, q, T = 1.5, 1e-5, 0.0625, 96
        dt = suggest_pld_dt(eps, T)
        z = calibrate_noise_multiplier_pld(eps, d, q, T, dt=dt)
        assert compute_epsilon_pld(T, q, z, d, dt=dt) <= eps + 1e-9
        z_rdp = calibrate_noise_multiplier(eps, d, q, T)
        assert z < z_rdp

    def test_finer_grid_is_tighter_but_still_valid(self):
        q, z, T, d = 0.1, 1.0, 64, 1e-5
        e_coarse = compute_epsilon_pld(T, q, z, d, dt=2e-3)
        e_fine = compute_epsilon_pld(T, q, z, d, dt=2e-4)
        assert e_fine <= e_coarse + 1e-9
        # both still upper-bound... cross-check against RDP from above is
        # not available (RDP is looser); check against a much finer grid
        e_finest = compute_epsilon_pld(T, q, z, d, dt=5e-5)
        assert e_finest <= e_fine + 1e-9
        # convergence: coarse-to-finest spread stays small
        assert e_coarse - e_finest < 0.1 * e_finest + 0.05


def test_auto_grid_slack_within_5pct_of_fine_grid():
    """Round-4 adversarial review (VERDICT #7): the auto-sized grid's
    pessimistic discretization slack over a LONG composition stays within
    the advertised ~5% of ε — compared against an 8× finer grid at the
    same (steps, q, z, δ)."""
    from fl_tpu.fl.pld import compute_epsilon_pld, suggest_pld_dt

    steps, q, z, delta = 256, 0.02, 1.1, 1e-5
    eps_auto = compute_epsilon_pld(steps, q, z, delta)  # auto dt
    dt = suggest_pld_dt(eps_auto, steps)
    eps_fine = compute_epsilon_pld(steps, q, z, delta, dt / 8.0)
    assert eps_auto >= eps_fine  # pessimistic: coarser is never smaller
    assert eps_auto - eps_fine <= 0.06 * eps_fine, (eps_auto, eps_fine)


def test_budget_gate_certification_is_sound_at_its_own_grid():
    """The engine's PLD budget gate certifies N* by bisection; whatever
    grid games happen along the way, the certified N* must satisfy
    ε(N*) ≤ budget at the gate's own grid AND at a finer one (soundness
    does not depend on monotonicity of the auto-gridded curve)."""
    import numpy as np

    from fl_tpu.core.types import PrivacyConfig
    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.fl.pld import compute_epsilon_pld
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import (
        FederatedRoundEngine,
        RoundEngineConfig,
    )

    splits = load_dataset("mnist", n_train_synth=128, n_test_synth=32)
    arrays = make_federated_arrays(splits, num_clients=4, strategy="iid",
                                   samples_per_client=32, seed=0)
    eng = FederatedRoundEngine(
        create_model("simple_cnn"), arrays,
        RoundEngineConfig(
            training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
            dp_mode="dp_sgd", accountant="pld",
            privacy=PrivacyConfig(epsilon=2.0, delta=1e-5,
                                  max_grad_norm=1.0, noise_multiplier=1.5),
            max_clients=4, seed=0))
    n_star = eng._pld_step_budget()
    assert n_star > 0
    q, _ = eng._rdp_round_params()
    eps_at_gate = compute_epsilon_pld(n_star, q, 1.5, 1e-5,
                                      eng.config.pld_dt)
    assert eps_at_gate <= 2.0 + 1e-12
    # and on a fixed finer grid (true-ε upper bound tightens only)
    from fl_tpu.fl.pld import suggest_pld_dt

    fine = suggest_pld_dt(2.0, n_star) / 4.0
    assert compute_epsilon_pld(n_star, q, 1.5, 1e-5, fine) <= 2.0 + 1e-12
    assert np.isfinite(eps_at_gate)
