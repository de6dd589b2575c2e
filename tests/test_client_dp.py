"""Client-level DP-FedAvg (dp_mode="client_dp"): per-client delta clipping,
central aggregate noise, client-sampling RDP accounting."""

import numpy as np
import pytest

from fl_tpu.core.types import PrivacyConfig
from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl.accounting import compute_epsilon
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.fl.privacy import PrivacyError
from fl_tpu.models import create_model
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig


@pytest.fixture(scope="module")
def mnist():
    return load_dataset("mnist", n_train_synth=256, n_test_synth=64)


def make_engine(mnist, epsilon=2.0, z=2.0, participation=0.5, seed=0):
    model = create_model("simple_cnn")
    fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                               samples_per_client=32, seed=seed)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
        dp_mode="client_dp",
        privacy=PrivacyConfig(epsilon=epsilon, delta=1e-5, max_grad_norm=1.0,
                              noise_multiplier=z),
        participation_rate=participation,
        seed=seed,
    )
    return FederatedRoundEngine(model, fa, cfg)


def test_client_dp_round_runs_and_accounts(mnist):
    eng = make_engine(mnist)
    r = eng.run_round(evaluate=False)
    assert np.isfinite(r.train_loss)
    eps = eng.rdp_accountant.get_epsilon(1e-5)
    # one round = one subsampled-Gaussian invocation at q=participation
    expected = compute_epsilon(1, q=0.5, noise_multiplier=2.0, delta=1e-5)
    assert eps == pytest.approx(expected, rel=1e-9)
    assert r.epsilon_spent == pytest.approx(eps)
    ledger = eng.accountant.get_privacy_ledger()
    assert ledger[0]["metadata"]["mode"] == "client_dp"
    assert ledger[0]["metadata"]["q"] == 0.5


def test_client_dp_noise_scale_matters(mnist):
    """Different z with the same seed produce different aggregates — the
    central noise is real and keyed per round."""
    quiet = make_engine(mnist, epsilon=50.0, z=0.5, participation=1.0, seed=5)
    loud = make_engine(mnist, epsilon=50.0, z=5.0, participation=1.0, seed=5)
    mask = np.ones(4, np.float32)
    quiet.run_round(mask=mask, evaluate=False)
    loud.run_round(mask=mask, evaluate=False)
    wq = quiet.get_model_weights()
    wl = loud.get_model_weights()
    assert any(not np.allclose(np.asarray(wq[k]), np.asarray(wl[k]))
               for k in wq)


def test_clip_client_deltas_bounds_influence():
    """The per-client clip gives the C/m sensitivity the central mechanism
    relies on: every clipped delta has global norm ≤ C."""
    import jax.numpy as jnp

    from fl_tpu.core import pytree as pt
    from fl_tpu.fl.privacy import clip_client_deltas

    rng = np.random.default_rng(0)
    stacked = {
        "a": jnp.asarray(rng.normal(0, 3.0, (6, 16)), jnp.float32),
        "b": jnp.asarray(rng.normal(0, 0.001, (6, 8)), jnp.float32),
    }
    clipped, pre_norms = clip_client_deltas(stacked, max_norm=1.0)
    per_client = [
        float(pt.global_norm({"a": clipped["a"][i], "b": clipped["b"][i]}))
        for i in range(6)
    ]
    assert all(n <= 1.0 + 1e-5 for n in per_client)
    assert np.asarray(pre_norms).max() > 1.0  # something actually clipped


def test_client_dp_budget_exhaustion(mnist):
    eng = make_engine(mnist, epsilon=0.5, z=2.0, participation=1.0)
    with pytest.raises(PrivacyError):
        for _ in range(50):
            eng.run_round(evaluate=False)
    assert eng.rdp_accountant.get_epsilon(1e-5) <= 0.5 + 1e-9


def test_client_dp_fused_rounds(mnist):
    eng = make_engine(mnist, epsilon=5.0, z=2.0, participation=1.0)
    results = eng.run_rounds_fused(2, evaluate=False)
    assert len(results) == 2
    expected = compute_epsilon(2, q=1.0, noise_multiplier=2.0, delta=1e-5)
    assert eng.rdp_accountant.get_epsilon(1e-5) == pytest.approx(
        expected, rel=1e-9)


def test_client_dp_sigma_uses_fixed_expected_count(mnist):
    """σ and the mean denominator must be the FIXED m̄ = q·N, not the
    realized participant count — a realized-count denominator halves the
    effective noise multiplier and understates ε ~2× (advisor finding r1)."""
    import jax.numpy as jnp

    z, q, n_clients = 2.0, 0.5, 4
    eng = make_engine(mnist, epsilon=50.0, z=z, participation=q)
    expected_sigma = z * 1.0 / (q * n_clients)
    for n_active in (1, 4):
        mask = np.zeros(n_clients, np.float32)
        mask[:n_active] = 1.0
        _, _, metrics = eng._superstep(
            eng.global_variables, jnp.asarray(0, jnp.int32),
            jnp.asarray(mask), jnp.asarray(eng.epochs_per_client),
            eng.data.images, eng.data.labels, eng.data.num_samples,
            eng.uplink_error,
        )
        assert float(metrics["dp_sigma_mean"]) == pytest.approx(
            expected_sigma, rel=1e-6)


def test_client_dp_sampling_is_pure_poisson(mnist):
    """min_clients forcing and max_clients capping are data-dependent
    inclusions that void the subsampling amplification; in client_dp mode
    the participation mask must be pure Poisson (advisor finding r1)."""
    model = create_model("simple_cnn")
    fa = make_federated_arrays(mnist, num_clients=8, strategy="iid",
                               samples_per_client=16, seed=0)
    # participation 0 + min_clients 2: a forced mask would have sum >= 2
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
        dp_mode="client_dp",
        privacy=PrivacyConfig(epsilon=5.0, delta=1e-5, max_grad_norm=1.0,
                              noise_multiplier=2.0),
        participation_rate=0.0, min_clients=2, seed=0,
    )
    eng = FederatedRoundEngine(model, fa, cfg)
    assert eng.sample_participation().sum() == 0.0
    # participation 1 + max_clients 2: a capped mask would have sum <= 2
    cfg2 = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
        dp_mode="client_dp",
        privacy=PrivacyConfig(epsilon=5.0, delta=1e-5, max_grad_norm=1.0,
                              noise_multiplier=2.0),
        participation_rate=1.0, max_clients=2, seed=0,
    )
    eng2 = FederatedRoundEngine(model, fa, cfg2)
    assert eng2.sample_participation().sum() == 8.0
