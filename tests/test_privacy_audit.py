"""One-run privacy audit (Steinke, Nasr & Jagielski 2023).

Capability extension: the reference's only privacy validation is the
noise-σ band check (src/validation/privacy_validator.py:104-108); here a
single training run with canary clients yields a measured client-level ε
lower bound to hold against the RDP accountant's certified ε.
"""

import math

import numpy as np
import pytest

from fl_tpu.core.types import PrivacyConfig
from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models import create_model
from fl_tpu.orchestration import RoundEngineConfig
from fl_tpu.validation.audit import (
    append_canary_clients,
    audit_tail_probability,
    binomial_sf,
    canary_guesses,
    empirical_epsilon_lower_bound,
    run_client_membership_audit,
)


# ---------------------------------------------------------------------------
# statistical machinery
# ---------------------------------------------------------------------------

def test_binomial_sf_exact():
    # brute-force cross-check at small n
    from itertools import product
    r, p = 6, 0.3
    for v in range(r + 2):
        brute = sum(
            math.prod(p if b else (1 - p) for b in bits)
            for bits in product([0, 1], repeat=r) if sum(bits) >= v
        )
        assert binomial_sf(v, r, p) == pytest.approx(brute, rel=1e-12)
    assert binomial_sf(0, 10, 0.5) == 1.0
    assert binomial_sf(11, 10, 0.5) == 0.0
    assert binomial_sf(3, 10, 0.0) == 0.0
    assert binomial_sf(3, 10, 1.0) == 1.0


def test_tail_monotone_in_epsilon():
    # larger ε admits more correct guesses -> larger tail probability
    tails = [audit_tail_probability(15, 20, e) for e in (0.1, 0.5, 1, 2, 4)]
    assert all(a < b for a, b in zip(tails, tails[1:]))


def test_lower_bound_closed_form_all_correct():
    """c = r = 20 all-correct guesses, β=0.05: tail = p^r, so the refuted
    boundary is p* = β^(1/r) and ε* = logit(p*)."""
    r = 20
    beta = 0.05
    p_star = beta ** (1 / r)
    expected = math.log(p_star / (1 - p_star))
    got = empirical_epsilon_lower_bound(r, r, num_canaries=r,
                                        confidence=0.95)
    assert got == pytest.approx(expected, abs=1e-6)


def test_lower_bound_monotone_in_correct():
    bounds = [empirical_epsilon_lower_bound(c, 24, 32) for c in
              (12, 16, 20, 22, 24)]
    assert bounds[0] == 0.0  # chance-level guessing refutes nothing
    assert all(a <= b for a, b in zip(bounds, bounds[1:]))
    assert bounds[-1] > 1.0


def test_lower_bound_delta_slack_weakens():
    strict = empirical_epsilon_lower_bound(20, 20, 20, delta=0.0)
    slacked = empirical_epsilon_lower_bound(20, 20, 20, delta=1e-3)
    assert slacked < strict
    # negligible delta barely moves it
    near = empirical_epsilon_lower_bound(20, 20, 20, delta=1e-9)
    assert near == pytest.approx(strict, rel=1e-3)


def test_lower_bound_validates_inputs():
    with pytest.raises(ValueError):
        empirical_epsilon_lower_bound(5, 4, 10)
    assert empirical_epsilon_lower_bound(0, 0, 10) == 0.0


def test_canary_guesses_shape_and_abstention():
    scores = np.asarray([5.0, -1.0, 3.0, 0.0, -2.0, 4.0])
    g = canary_guesses(scores, k_pos=2, k_neg=2)
    assert g.tolist() == [1, -1, 0, 0, -1, 1]
    with pytest.raises(ValueError):
        canary_guesses(scores, 4, 3)


# ---------------------------------------------------------------------------
# canary construction
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mnist():
    return load_dataset("mnist", n_train_synth=256, n_test_synth=64)


def test_append_canaries(mnist):
    fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                               samples_per_client=16, seed=0)
    out = append_canary_clients(fa, num_canaries=3, canary_samples=8, seed=1)
    assert out.num_clients == 7
    assert out.images.shape == (7, 16, 28, 28, 1)
    np.testing.assert_array_equal(out.images[:4], fa.images)
    assert out.num_samples[4:].tolist() == [8, 8, 8]
    # canary slots beyond the sample count stay zero (masked out)
    assert out.images[4:, 8:].max() == 0
    # canary data is actually random, not zeros
    assert out.images[4:, :8].std() > 50
    with pytest.raises(ValueError):
        append_canary_clients(fa, 2, canary_samples=99)


# ---------------------------------------------------------------------------
# end-to-end audits (tiny scale, deterministic seeds)
# ---------------------------------------------------------------------------

def _config(dp_mode, z=1.0, epsilon=1e6, q=1.0, local_epochs=5):
    privacy = None
    if dp_mode != "none":
        privacy = PrivacyConfig(epsilon=epsilon, delta=1e-5,
                                max_grad_norm=5.0, noise_multiplier=z)
    return RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=local_epochs,
                                         batch_size=8, learning_rate=0.01),
        dp_mode=dp_mode, privacy=privacy, participation_rate=q, seed=0,
    )


def test_audit_rejects_example_level_mode(mnist):
    fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                               samples_per_client=16, seed=0)
    model = create_model("simple_cnn")
    with pytest.raises(ValueError, match="example-level"):
        run_client_membership_audit(model, fa, _config("dp_sgd"))


def test_update_canaries_require_client_dp(mnist):
    fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                               samples_per_client=16, seed=0)
    model = create_model("simple_cnn")
    with pytest.raises(ValueError, match="client_dp"):
        run_client_membership_audit(model, fa, _config("none"),
                                    canary_kind="update")


def test_update_audit_weak_dp_finds_signal(mnist):
    """At z=0.1 the mechanism barely hides anything; update canaries
    through the production clip→noise path must separate perfectly and
    refute small ε (the attack side of the harness works)."""
    fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                               samples_per_client=16, seed=0)
    model = create_model("simple_cnn")
    out = run_client_membership_audit(
        model, fa, _config("client_dp", z=0.1, local_epochs=1),
        num_canaries=16, num_rounds=4, guess_fraction=0.25, seed=5)
    assert out["canary_kind"] == "update"
    assert out["num_correct"] == out["num_guesses"]  # clean separation
    assert out["empirical_epsilon_lower_bound"] > 0.5
    assert out["consistent"]  # certified ε is huge at z=0.1


def test_update_audit_consistent_with_accountant(mnist):
    """Under real client-level DP (z=1) the measured lower bound must sit
    at or below the certified ε — the audit validating the mechanism.
    Deterministic seeds make this a hard regression gate: a broken σ,
    sensitivity, or reused noise key would push the bound over."""
    fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                               samples_per_client=16, seed=0)
    model = create_model("simple_cnn")
    out = run_client_membership_audit(
        model, fa, _config("client_dp", z=1.0, local_epochs=1),
        num_canaries=16, num_rounds=4, seed=7)
    assert out["certified_epsilon"] is not None
    assert out["consistent"], (
        f"audited ε {out['empirical_epsilon_lower_bound']} exceeds "
        f"certified {out['certified_epsilon']} — mechanism bug")


def test_update_audit_poisson_participation(mnist):
    """q<1: canary membership evidence survives Poisson subsampling (an
    included canary only participates in ~q of the rounds)."""
    fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                               samples_per_client=16, seed=0)
    model = create_model("simple_cnn")
    out = run_client_membership_audit(
        model, fa, _config("client_dp", z=0.1, q=0.5, local_epochs=1),
        num_canaries=16, num_rounds=6, seed=3)
    assert out["num_correct"] >= out["num_guesses"] - 1
    assert out["consistent"]


def test_data_canary_audit_small_cohort_signal(mnist):
    """Black-box data canaries: the documented weak instrument. At high
    per-canary weight (2 real + 4 canary clients) and enough rounds the
    loss-drop score must still rank included canaries above excluded."""
    fa = make_federated_arrays(mnist, num_clients=2, strategy="iid",
                               samples_per_client=16, seed=0)
    model = create_model("simple_cnn")
    out = run_client_membership_audit(
        model, fa, _config("none"), num_canaries=4, num_rounds=12,
        canary_samples=16, canary_kind="data", score_method="loss_drop",
        guess_fraction=0.25, seed=3)
    s = np.asarray(out["scores"])
    inc = np.asarray(out["included"], bool)
    assert inc.any() and (~inc).any()  # seed gives a non-degenerate split
    assert s[inc].min() > s[~inc].max()
    assert out["certified_epsilon"] is None
    assert out["score_method"] == "loss_drop"


def test_data_canary_grad_dot_runs(mnist):
    fa = make_federated_arrays(mnist, num_clients=2, strategy="iid",
                               samples_per_client=16, seed=0)
    model = create_model("simple_cnn")
    out = run_client_membership_audit(
        model, fa, _config("none"), num_canaries=4, num_rounds=1,
        canary_samples=8, canary_kind="data", score_method="grad_dot",
        seed=2)
    assert len(out["scores"]) == 4
    assert np.isfinite(out["scores"]).all()


def test_update_audit_on_mesh_matches_single_device(mnist, mesh8):
    """The injection in_specs shard the canary-direction pytree over the
    client axis; sharded and unsharded audits must agree bit-for-bit on
    scores and guesses (4 real + 12 canaries = 16 clients / 8 devices)."""
    fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                               samples_per_client=16, seed=0)
    model = create_model("simple_cnn")
    kw = dict(num_canaries=12, num_rounds=2, guess_fraction=0.25, seed=9)
    single = run_client_membership_audit(
        model, fa, _config("client_dp", z=0.1, local_epochs=1), **kw)
    sharded = run_client_membership_audit(
        model, fa, _config("client_dp", z=0.1, local_epochs=1),
        mesh=mesh8, **kw)
    np.testing.assert_allclose(single["scores"], sharded["scores"],
                               rtol=1e-4, atol=1e-6)
    assert single["num_correct"] == sharded["num_correct"]
    assert (single["empirical_epsilon_lower_bound"]
            == sharded["empirical_epsilon_lower_bound"])


def test_injection_requires_config_flag(mnist):
    """run_round must reject injection args when the engine wasn't built
    for them (the superstep signature is static)."""
    from fl_tpu.orchestration import FederatedRoundEngine

    fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                               samples_per_client=16, seed=0)
    model = create_model("simple_cnn")
    eng = FederatedRoundEngine(model, fa, _config("client_dp"))
    with pytest.raises(ValueError, match="audit_injection"):
        eng.run_round(evaluate=False,
                      inject_flags=np.ones(4, np.float32))


def test_injection_zero_flags_is_noop(mnist):
    """An audit_injection engine with all-zero flags must reproduce the
    plain client_dp round exactly (the hook is free when unused)."""
    from fl_tpu.orchestration import FederatedRoundEngine

    fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                               samples_per_client=16, seed=0)
    model = create_model("simple_cnn")
    import dataclasses as dc

    plain = FederatedRoundEngine(model, fa, _config("client_dp"))
    audit = FederatedRoundEngine(
        model, fa, dc.replace(_config("client_dp"), audit_injection=True))
    mask = np.ones(4, np.float32)
    plain.run_round(mask=mask, evaluate=False)
    audit.run_round(mask=mask, evaluate=False)
    w1, w2 = plain.get_model_weights(), audit.get_model_weights()
    for k in w1:
        np.testing.assert_allclose(np.asarray(w1[k]), np.asarray(w2[k]),
                                   rtol=1e-6, atol=1e-7)
