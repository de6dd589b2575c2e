"""DP-FTRL: tree-aggregated client-level DP without sampling
(fl_tpu.fl.dp_ftrl + engine dp_mode="dp_ftrl").

Capability extension over the reference (its DP is a per-update Gaussian
with naive additive accounting, src/shared/privacy.py); Kairouz et al.
2021, arXiv:2103.00039.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fl_tpu.core.types import PrivacyConfig
from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl import dp_ftrl
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.fl.privacy import PrivacyError
from fl_tpu.models import create_model
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig


# ---- accounting math ----

def test_gaussian_epsilon_monotone_and_sane():
    eps2 = dp_ftrl.gaussian_epsilon(2.0, 1e-5)
    eps4 = dp_ftrl.gaussian_epsilon(4.0, 1e-5)
    assert 0 < eps4 < eps2
    # classical ballpark: z=1 at delta=1e-5 is a few units of epsilon
    e1 = dp_ftrl.gaussian_epsilon(1.0, 1e-5)
    assert 2.0 < e1 < 6.0
    assert dp_ftrl.gaussian_epsilon(0.0, 1e-5) == float("inf")


def test_calibration_inverts_epsilon():
    for eps in (0.5, 1.0, 4.0):
        z = dp_ftrl.calibrate_noise_multiplier(eps, 1e-5)
        assert dp_ftrl.gaussian_epsilon(z, 1e-5) <= eps
        # not overly conservative: slightly less noise must break the bound
        assert dp_ftrl.gaussian_epsilon(z * 0.98, 1e-5) > eps


def test_tree_height_and_sensitivity():
    assert dp_ftrl.tree_height(1) == 1
    assert dp_ftrl.tree_height(2) == 2
    assert dp_ftrl.tree_height(8) == 4
    assert dp_ftrl.tree_height(9) == 5
    assert dp_ftrl.ftrl_sensitivity(2.0, 8, 1) == pytest.approx(
        2.0 * math.sqrt(4))
    assert dp_ftrl.ftrl_sensitivity(1.0, 8, 3) == pytest.approx(
        math.sqrt(12))


def test_prefix_node_count_is_popcount():
    for t, want in ((1, 1), (2, 1), (3, 2), (7, 3), (8, 1), (13, 3)):
        assert dp_ftrl.prefix_node_count(t) == want


# ---- tree noise ----

def test_tree_noise_deterministic_and_node_reuse():
    key = jax.random.PRNGKey(0)
    # t=3 cover = {[1,2], [3,3]}; t=2 cover = {[1,2]} — the shared node
    # must contribute the SAME draw, so n3 - n2 equals the [3,3] leaf
    # noise, which is also the difference at independent regeneration
    n2 = dp_ftrl.tree_noise_prefix(key, jnp.uint32(2), 256, 1.0, 4)
    n2b = dp_ftrl.tree_noise_prefix(key, jnp.uint32(2), 256, 1.0, 4)
    n3 = dp_ftrl.tree_noise_prefix(key, jnp.uint32(3), 256, 1.0, 4)
    np.testing.assert_array_equal(np.asarray(n2), np.asarray(n2b))
    assert not np.array_equal(np.asarray(n2), np.asarray(n3))
    # t=4 cover = {[1,4]} — single fresh node, not n2 + anything
    n4 = dp_ftrl.tree_noise_prefix(key, jnp.uint32(4), 256, 1.0, 4)
    assert not np.array_equal(np.asarray(n4), np.asarray(n2))


def test_tree_noise_variance_tracks_popcount():
    """Var[S̃_t noise] = popcount(t)·σ² — the whole point of the tree:
    t=7 carries 3 units of variance, t=8 only 1."""
    key = jax.random.PRNGKey(42)
    dim = 4096
    v7 = float(jnp.var(dp_ftrl.tree_noise_prefix(
        key, jnp.uint32(7), dim, 1.0, 4)))
    v8 = float(jnp.var(dp_ftrl.tree_noise_prefix(
        key, jnp.uint32(8), dim, 1.0, 4)))
    assert v7 == pytest.approx(3.0, rel=0.15)
    assert v8 == pytest.approx(1.0, rel=0.15)


def test_rotation_mask_schedule():
    m0 = dp_ftrl.rotation_mask(8, 0, 4)
    m1 = dp_ftrl.rotation_mask(8, 1, 4)
    np.testing.assert_array_equal(m0, [1, 1, 1, 1, 0, 0, 0, 0])
    np.testing.assert_array_equal(m1, [0, 0, 0, 0, 1, 1, 1, 1])
    assert dp_ftrl.max_rounds_within_participations(8, 4, 1) == 2
    assert dp_ftrl.max_rounds_within_participations(8, 4, 3) == 6


# ---- engine integration ----

@pytest.fixture(scope="module")
def mnist():
    return load_dataset("mnist", n_train_synth=512, n_test_synth=128)


def make_engine(mnist, num_clients=8, z=2.0, t_max=4, k=1, cohort=None,
                momentum=0.9, seed=0, mesh=None, lr=0.5, max_norm=1.0,
                epsilon=None, **cfg_kw):
    model = create_model("simple_cnn")
    fa = make_federated_arrays(mnist, num_clients=num_clients,
                               strategy="iid", samples_per_client=32,
                               seed=seed)
    if epsilon is None:
        epsilon = dp_ftrl.gaussian_epsilon(z, 1e-5) + 0.01
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=1, batch_size=16,
                                         learning_rate=0.01),
        dp_mode="dp_ftrl",
        privacy=PrivacyConfig(epsilon=epsilon, delta=1e-5,
                              max_grad_norm=max_norm, noise_multiplier=z),
        ftrl_rounds=t_max, ftrl_max_participations=k,
        ftrl_cohort_size=cohort, ftrl_momentum=momentum,
        ftrl_server_lr=lr, seed=seed,
        # paired engines in these tests must share one tree; production
        # default (None) draws fresh entropy per engine
        ftrl_tree_nonce=cfg_kw.pop("nonce", 7), **cfg_kw,
    )
    return FederatedRoundEngine(model, fa, cfg, mesh=mesh)


def test_config_validation(mnist):
    fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                               samples_per_client=16, seed=0)
    model = create_model("simple_cnn")
    pc = PrivacyConfig(epsilon=10.0, delta=1e-5, noise_multiplier=2.0)
    with pytest.raises(ValueError, match="ftrl_rounds"):
        FederatedRoundEngine(model, fa, RoundEngineConfig(
            dp_mode="dp_ftrl", privacy=pc))
    with pytest.raises(PrivacyError, match="certifies"):
        FederatedRoundEngine(model, fa, RoundEngineConfig(
            dp_mode="dp_ftrl", ftrl_rounds=4,
            privacy=PrivacyConfig(epsilon=0.1, delta=1e-5,
                                  noise_multiplier=1.0)))
    with pytest.raises(ValueError, match="server update"):
        FederatedRoundEngine(model, fa, RoundEngineConfig(
            dp_mode="dp_ftrl", ftrl_rounds=4, privacy=pc,
            server_optimizer="fedadam"))
    with pytest.raises(ValueError, match="not in"):
        FederatedRoundEngine(model, fa, RoundEngineConfig(
            dp_mode="bogus"))


def test_epsilon_charged_once_and_rotation(mnist):
    eng = make_engine(mnist, num_clients=8, t_max=4, cohort=2, k=1)
    r0 = eng.run_round(evaluate=False)
    assert r0.epsilon_spent == pytest.approx(eng._ftrl_eps_total)
    r1 = eng.run_round(evaluate=False)
    assert r1.epsilon_spent == 0.0
    # rotation: rounds 0..3 at cohort 2 touch each client exactly once
    eng.run_round(evaluate=False)
    eng.run_round(evaluate=False)
    np.testing.assert_array_equal(eng.ftrl_participations,
                                  np.ones(8, np.int64))


def test_participation_budget_enforced(mnist):
    eng = make_engine(mnist, num_clients=4, t_max=8, cohort=4, k=1)
    eng.run_round(mask=np.ones(4, np.float32), evaluate=False)
    with pytest.raises(PrivacyError, match="participation budget"):
        eng.run_round(mask=np.ones(4, np.float32), evaluate=False)


def test_tree_exhaustion_enforced(mnist):
    eng = make_engine(mnist, num_clients=8, t_max=2, cohort=2, k=1)
    eng.run_round(evaluate=False)
    eng.run_round(evaluate=False)
    with pytest.raises(PrivacyError, match="exhausted"):
        eng.run_round(evaluate=False)


def test_zero_noise_matches_manual_clipped_descent(mnist):
    """With z≈0 and β=0, the FTRL step telescopes to
    w_t = w_0 − (η/m̄)·Σ clipped participant sums — check round 1
    against a hand-computed clipped update."""
    from fl_tpu.ops.flatten import stack_flatten

    eng = make_engine(mnist, num_clients=2, t_max=4, cohort=2, k=2,
                      z=1e-6, momentum=0.0, lr=1.0, max_norm=0.5,
                      epsilon=1e12)
    w0 = {k: np.asarray(v, np.float32)
          for k, v in eng.get_model_weights().items()}
    # plain engine with identical seed/data/training gives the raw deltas
    ref = FederatedRoundEngine(
        create_model("simple_cnn"),
        make_federated_arrays(mnist, num_clients=2, strategy="iid",
                              samples_per_client=32, seed=0),
        RoundEngineConfig(
            training=FederatedTrainingConfig(local_epochs=1, batch_size=16,
                                             learning_rate=0.01),
            seed=0, min_clients=1),
    )
    mask = np.ones(2, np.float32)
    eng.run_round(mask=mask, evaluate=False)
    ref.run_round(mask=mask, evaluate=False)
    # ref (2 equal-sized iid clients) moves by mean(delta); dp_ftrl by
    # (1/m̄)·sum(clip(delta)). Per-client deltas aren't exposed, so just
    # verify: the dp_ftrl step norm <= (max participants·C)/m̄ AND the
    # direction correlates with the plain FedAvg step.
    wf = {k: np.asarray(v, np.float32)
          for k, v in eng.get_model_weights().items()}
    wr = {k: np.asarray(v, np.float32)
          for k, v in ref.get_model_weights().items()}
    dfl = np.concatenate([(wf[k] - w0[k]).ravel() for k in sorted(w0)])
    dre = np.concatenate([(wr[k] - w0[k]).ravel() for k in sorted(w0)])
    step_norm = float(np.linalg.norm(dfl))
    assert step_norm <= 2 * 0.5 / 2 + 1e-4  # m̄=2, C=0.5, 2 participants
    cos = float(dfl @ dre / (np.linalg.norm(dfl) * np.linalg.norm(dre)))
    assert cos > 0.9


def test_momentum_zero_telescopes_to_prefix_sum(mnist):
    """After 3 rounds at β=0, w_3 − w_0 must equal +(η/m̄)·S̃_3 where
    S̃_3 = cumsum + tree noise at t=3 (both observable on the engine)."""
    eng = make_engine(mnist, num_clients=8, t_max=4, cohort=2, k=1,
                      momentum=0.0, z=0.5, epsilon=1e12, lr=0.7)
    from fl_tpu.ops.flatten import stack_flatten

    w0 = {k: np.asarray(v, np.float32)
          for k, v in eng.get_model_weights().items()}
    for _ in range(3):
        eng.run_round(evaluate=False)
    wt = {k: np.asarray(v, np.float32)
          for k, v in eng.get_model_weights().items()}
    # engine-internal: prev_noisy IS S̃_3 after round 3
    s3 = np.asarray(eng.ftrl_prev_noisy)
    expect_flat = (0.7 / 2.0) * s3
    # flatten order: params tree leaves — rebuild via stack_flatten
    import jax

    delta_tree = jax.tree.map(
        lambda a, b: (jnp.asarray(a) - jnp.asarray(b))[None],
        {k: wt[k] for k in sorted(wt)}, {k: w0[k] for k in sorted(w0)})
    d_mat, _ = stack_flatten(delta_tree)
    from fl_tpu.ops.flatten import flat_dim

    real_d = flat_dim(delta_tree)  # tree noise also covers the lane-pad
    # columns, which never reach the params (unflatten drops them)
    got = np.asarray(d_mat)[0][:real_d]
    np.testing.assert_allclose(got, expect_flat[:real_d],
                               rtol=1e-4, atol=1e-5)


def test_noise_scales_with_z(mnist):
    """Same seed/data, two z values: the higher-z run's weights deviate
    more from the z≈0 run."""
    runs = {}
    for z in (1e-6, 0.5, 2.0):
        eng = make_engine(mnist, num_clients=4, t_max=2, cohort=2, k=1,
                          z=z, epsilon=1e12, momentum=0.0)
        eng.run_round(evaluate=False)
        runs[z] = np.concatenate(
            [np.asarray(v, np.float32).ravel()
             for _, v in sorted(eng.get_model_weights().items())])
    d_small = np.linalg.norm(runs[0.5] - runs[1e-6])
    d_big = np.linalg.norm(runs[2.0] - runs[1e-6])
    assert d_big > 2 * d_small


def test_dp_ftrl_mesh_matches_single_device(mnist, mesh8):
    single = make_engine(mnist, num_clients=8, t_max=4, cohort=4, k=1,
                         z=0.5, epsilon=1e12, seed=3)
    sharded = make_engine(mnist, num_clients=8, t_max=4, cohort=4, k=1,
                          z=0.5, epsilon=1e12, seed=3, mesh=mesh8)
    for _ in range(2):
        a = single.run_round(evaluate=False)
        b = sharded.run_round(evaluate=False)
    np.testing.assert_allclose(a.train_loss, b.train_loss,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(single.ftrl_prev_noisy),
                               np.asarray(sharded.ftrl_prev_noisy),
                               rtol=1e-4, atol=1e-6)
    for k_, v in single.get_model_weights().items():
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(sharded.get_model_weights()[k_]),
            rtol=1e-4, atol=1e-6)


def test_fresh_engines_draw_fresh_trees(mnist):
    """Default ftrl_tree_nonce=None: two engines with IDENTICAL config
    and seed must still use different node noise — otherwise an
    adversary could difference two trees' released prefix sums and
    cancel the noise entirely (tree-restart reuse attack)."""
    runs = []
    for _ in range(2):
        eng = make_engine(mnist, num_clients=4, t_max=2, cohort=2, k=1,
                          z=1.0, epsilon=1e12, momentum=0.0, nonce=None)
        eng.run_round(evaluate=False)
        runs.append(np.asarray(eng.ftrl_prev_noisy))
    assert not np.array_equal(runs[0], runs[1])
    # explicit matching nonces reproduce exactly (the test-suite mode)
    runs = []
    for _ in range(2):
        eng = make_engine(mnist, num_clients=4, t_max=2, cohort=2, k=1,
                          z=1.0, epsilon=1e12, momentum=0.0, nonce=99)
        eng.run_round(evaluate=False)
        runs.append(np.asarray(eng.ftrl_prev_noisy))
    np.testing.assert_array_equal(runs[0], runs[1])


def test_checkpoint_restores_tree_nonce(mnist, tmp_path):
    """A resumed engine must continue the SAME tree even if its own
    fresh nonce differed — future node draws have to match the carried
    noisy prefix."""
    from fl_tpu.orchestration.checkpoint import (
        restore_engine_checkpoint,
        save_engine_checkpoint,
    )

    eng = make_engine(mnist, num_clients=8, t_max=8, cohort=2, k=1,
                      z=0.5, epsilon=1e12, nonce=1234)
    eng.run_round(evaluate=False)
    save_engine_checkpoint(eng, str(tmp_path))
    fresh = make_engine(mnist, num_clients=8, t_max=8, cohort=2, k=1,
                        z=0.5, epsilon=1e12, nonce=None)  # different tree
    restore_engine_checkpoint(fresh, str(tmp_path))
    assert fresh._ftrl_nonce == 1234
    a = eng.run_round(evaluate=False)
    b = fresh.run_round(evaluate=False)
    np.testing.assert_allclose(np.asarray(eng.ftrl_prev_noisy),
                               np.asarray(fresh.ftrl_prev_noisy),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(a.train_loss, b.train_loss,
                               rtol=1e-5, atol=1e-7)


def test_straggler_dropout_applies_to_rotation(mnist):
    eng = make_engine(mnist, num_clients=8, t_max=8, cohort=8, k=8,
                      z=0.5, epsilon=1e12,
                      straggler_dropout_rate=0.95)
    masks = [eng.sample_participation() for _ in range(4)]
    total = sum(int(m.sum()) for m in masks)
    assert total < 4 * 8  # dropout actually removed clients


def test_dp_ftrl_checkpoint_roundtrip(mnist, tmp_path):
    from fl_tpu.orchestration.checkpoint import (
        restore_engine_checkpoint,
        save_engine_checkpoint,
    )

    eng = make_engine(mnist, num_clients=8, t_max=8, cohort=2, k=1,
                      z=0.5, epsilon=1e12)
    eng.run_round(evaluate=False)
    eng.run_round(evaluate=False)
    save_engine_checkpoint(eng, str(tmp_path))

    fresh = make_engine(mnist, num_clients=8, t_max=8, cohort=2, k=1,
                        z=0.5, epsilon=1e12)
    restore_engine_checkpoint(fresh, str(tmp_path))
    np.testing.assert_array_equal(fresh.ftrl_participations,
                                  eng.ftrl_participations)
    a = eng.run_round(evaluate=False)
    b = fresh.run_round(evaluate=False)
    np.testing.assert_allclose(a.train_loss, b.train_loss,
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(eng.ftrl_cumsum),
                               np.asarray(fresh.ftrl_cumsum),
                               rtol=1e-5, atol=1e-7)
