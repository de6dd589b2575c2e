"""Distributed DP (Skellam mechanism over modular integer aggregation):
accounting certification, integer-pipeline invariants, engine integration,
mesh equality, checkpointing. See fl_tpu/fl/distributed_dp.py."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.core import prng
from fl_tpu.core.types import PrivacyConfig
from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl import distributed_dp as ddp
from fl_tpu.fl.accounting import DEFAULT_ALPHAS
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.fl.privacy import PrivacyError
from fl_tpu.models import create_model
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig


# ===========================================================================
# Accounting: the closed-form RDP bound is certified against the EXACT
# Rényi divergence (log-space Bessel-series pmf)
# ===========================================================================

def test_skellam_log_pmf_is_a_pmf_and_matches_scipy():
    from scipy.stats import skellam as ref

    for mu in [0.5, 5.0, 50.0, 500.0]:
        k = np.arange(-int(20 * math.sqrt(mu) + 30),
                      int(20 * math.sqrt(mu) + 31))
        lp = ddp._skellam_log_pmf(k, mu)
        assert np.exp(lp).sum() == pytest.approx(1.0, abs=1e-10)
        ref_lp = ref.logpmf(k, mu / 2, mu / 2)
        ok = np.isfinite(ref_lp)  # scipy's Bessel underflows in far tails
        assert np.abs(lp[ok] - ref_lp[ok]).max() < 1e-8


def test_skellam_rdp_bound_dominates_exact_divergence():
    """Certification of the closed-form bound (constants included) against
    the numerically exact concentrated-shift divergence, across the
    operating regime μ/Δ² = z² ∈ [0.25, 25] — i.e. noise multipliers
    z ∈ [0.5, 5] — and a range of shift magnitudes and orders."""
    for mu_ratio in [0.25, 1.0, 4.0, 25.0]:
        for d2 in [1, 3, 10]:
            mu = mu_ratio * d2 * d2
            for alpha in [2, 8, 64]:
                exact = ddp.skellam_renyi_divergence_exact(mu, d2, alpha)
                bound = float(ddp.skellam_rdp(mu, d2, d2, [alpha])[0])
                assert np.isfinite(exact)
                assert bound >= exact - 1e-12, (mu, d2, alpha)


def test_skellam_rdp_bound_dominates_spread_allocations():
    """Multi-coordinate shifts: per-coordinate divergences add; the bound
    at (Δ₂=‖δ‖₂, Δ₁=‖δ‖₁) must dominate every allocation."""
    for (a, b) in [(2, 3), (5, 5), (1, 10)]:
        mu = 4.0 * (a * a + b * b)
        for alpha in [2, 8, 64]:
            exact = (ddp.skellam_renyi_divergence_exact(mu, a, alpha)
                     + ddp.skellam_renyi_divergence_exact(mu, b, alpha))
            bound = float(ddp.skellam_rdp(
                mu, math.sqrt(a * a + b * b), a + b, [alpha])[0])
            assert bound >= exact - 1e-12, (a, b, alpha)


def test_skellam_rdp_approaches_gaussian_rate():
    """As μ/Δ² → ∞ the Skellam RDP must converge to the Gaussian αΔ²/2μ."""
    d2, d1 = 100.0, 1000.0
    mu = 1e8
    rdp = ddp.skellam_rdp(mu, d2, d1, [8])[0]
    assert rdp == pytest.approx(8 * d2 ** 2 / (2 * mu), rel=1e-3)


def test_plan_properties_and_calibration():
    plan = ddp.DistributedDPPlan(clip_norm=1.0, bits=14, dim=422_000,
                                 expected_clients=512, noise_multiplier=1.0)
    assert plan.gamma == pytest.approx(1.0 / 2 ** 14)
    # per-coordinate rounding error bound 1 + ulp(2^bits) in f32
    assert plan.delta2 == pytest.approx(
        2 ** 14 + (1 + 2.0 ** (14 - 23)) * math.sqrt(422_000))
    # full participation: central variance = (z·Δ₂)²
    assert plan.mu_local * 512 == pytest.approx(plan.mu_central)
    eps1 = ddp.distributed_epsilon(plan, rounds=1, delta=1e-5)
    eps10 = ddp.distributed_epsilon(plan, rounds=10, delta=1e-5)
    assert 0 < eps1 < eps10
    # z=1 single-round ε must land within a hair of the same-z Gaussian
    # mechanism under the SAME RDP conversion (the Skellam correction is
    # tiny at bits=14)
    from fl_tpu.fl.accounting import compute_epsilon

    gauss = compute_epsilon(1, q=1.0, noise_multiplier=1.0, delta=1e-5)
    assert eps1 == pytest.approx(gauss, rel=1e-3)
    assert eps1 >= gauss  # the correction only ever adds

    z = ddp.calibrate_noise_multiplier(
        target_epsilon=2.0, delta=1e-5, rounds=5, clip_norm=1.0,
        bits=14, dim=422_000, expected_clients=512)
    plan_z = ddp.DistributedDPPlan(1.0, 14, 422_000, 512, z)
    assert ddp.distributed_epsilon(plan_z, 5, 1e-5) <= 2.0 + 1e-6
    # minimality: 5% less noise must overshoot the target
    plan_lo = ddp.DistributedDPPlan(1.0, 14, 422_000, 512, z * 0.95)
    assert ddp.distributed_epsilon(plan_lo, 5, 1e-5) > 2.0


def test_wraparound_check():
    ok = ddp.DistributedDPPlan(1.0, 14, 100_000, 512, 1.0)
    ddp.check_no_wraparound(ok, 512)
    too_hot = ddp.DistributedDPPlan(1.0, 20, 100_000, 4096, 1.0)
    with pytest.raises(ValueError, match="overflow"):
        ddp.check_no_wraparound(too_hot, 4096)


def test_zero_participants_cost_zero_epsilon():
    plan = ddp.DistributedDPPlan(1.0, 14, 1000, 8, 1.0)
    assert np.all(plan.round_rdp(0) == 0.0)
    assert np.all(np.isfinite(plan.round_rdp(1)))
    # fewer participants -> less summed noise -> strictly more RDP
    assert np.all(plan.round_rdp(4) > plan.round_rdp(8))


# ===========================================================================
# Device-side integer pipeline
# ===========================================================================

def _keys(n, seed=0):
    root = prng.root_key(seed)
    return jax.vmap(lambda i: jax.random.fold_in(root, i))(jnp.arange(n))


def test_stochastic_round_unbiased_and_bounded():
    gamma = 0.25
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 64)),
                    jnp.float32)
    mats = jnp.tile(x, (4096, 1))
    out = ddp.stochastic_round(mats, gamma, _keys(4096))
    out = np.asarray(out, np.float64)
    # unbiased: mean over draws recovers x/γ within CLT tolerance
    err = np.abs(out.mean(axis=0) - np.asarray(x[0]) / gamma)
    assert err.max() < 4.0 / math.sqrt(4096) + 1e-3
    # per-coordinate error strictly < 1; exact zeros stay exactly zero
    assert np.abs(out - np.asarray(x, np.float64) / gamma).max() < 1.0
    z = ddp.stochastic_round(jnp.zeros((8, 32)), gamma, _keys(8))
    assert np.all(np.asarray(z) == 0)


def test_skellam_noise_moments_and_closure():
    lam = 8.0  # per-client Sk(2·lam): mean 0, variance 2·lam
    noise = np.asarray(ddp.skellam_noise(_keys(2048), lam, 256), np.float64)
    assert abs(noise.mean()) < 0.05
    assert noise.var() == pytest.approx(2 * lam, rel=0.05)
    # closure: the summed per-client noise variance is C·μ_local
    summed = noise.sum(axis=0)
    assert summed.var() == pytest.approx(2048 * 2 * lam, rel=0.2)


def test_masked_payloads_uniform_and_sum_preserving():
    """Pairwise int32 masks must cancel BIT-EXACTLY in the modular sum
    while making each payload marginally uniform on Z_2^32."""
    C, D = 8, 4096
    rng = np.random.default_rng(1)
    mat = jnp.asarray(rng.normal(0, 0.1, (C, D)), jnp.float32)
    mask = jnp.ones((C,), jnp.float32)
    keys = _keys(C)
    rkey = prng.root_key(99)
    gamma, mu_local = 1.0 / 2 ** 10, 64.0

    plain = ddp.client_integer_payloads(mat, mask, keys, gamma, mu_local)
    masked = ddp.masked_integer_payloads(mat, mask, keys, rkey, gamma,
                                         mu_local)
    s_plain = np.asarray(plain).astype(np.int64).sum(axis=0) % (2 ** 32)
    s_masked = np.asarray(masked).astype(np.int64).sum(axis=0) % (2 ** 32)
    np.testing.assert_array_equal(s_plain, s_masked)

    # hiding: masked payloads are spread over the full ring (a clipped
    # delta payload without masks sits within ±(2^10 + noise) of zero)
    u = np.asarray(masked).astype(np.int64) % (2 ** 32)
    assert u.std() > 0.2 * 2 ** 32
    assert np.abs(np.asarray(plain)).max() < 2 ** 14


def test_masks_respect_participation():
    """A pair's mask exists only when both endpoints participate, so the
    sum over PARTICIPANTS is preserved under dropout."""
    C, D = 6, 512
    mat = jnp.asarray(np.random.default_rng(2).normal(0, 0.1, (C, D)),
                      jnp.float32)
    mask = jnp.asarray([1, 0, 1, 1, 0, 1], jnp.float32)
    keys = _keys(C)
    rkey = prng.root_key(7)
    plain = ddp.client_integer_payloads(mat, mask, keys, 1e-3, 16.0)
    masked = plain + ddp.pairwise_integer_masks(rkey, C, D, alive=mask)
    # dropped rows transmit nothing and carry no mask residue
    s_p = np.asarray(plain).astype(np.int64).sum(axis=0) % (2 ** 32)
    alive_rows = np.asarray(masked)[np.asarray(mask) > 0]
    s_m = alive_rows.astype(np.int64).sum(axis=0) % (2 ** 32)
    np.testing.assert_array_equal(s_p, s_m)


# ===========================================================================
# Engine integration
# ===========================================================================

@pytest.fixture(scope="module")
def mnist():
    return load_dataset("mnist", n_train_synth=256, n_test_synth=64)


def make_engine(mnist, epsilon=8.0, z=1.0, bits=14, participation=1.0,
                seed=0, mesh=None, num_clients=4, dp_mode="distributed",
                fuse=True):
    model = create_model("simple_cnn")
    fa = make_federated_arrays(mnist, num_clients=num_clients,
                               strategy="iid", samples_per_client=32,
                               seed=seed)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
        dp_mode=dp_mode,
        privacy=PrivacyConfig(epsilon=epsilon, delta=1e-5,
                              max_grad_norm=1.0, noise_multiplier=z),
        participation_rate=participation,
        dist_bits=bits, dist_fuse_noise=fuse,
        seed=seed, max_clients=num_clients,
    )
    return FederatedRoundEngine(model, fa, cfg, mesh=mesh)


def test_distributed_round_runs_and_accounts(mnist):
    eng = make_engine(mnist)
    r = eng.run_round(evaluate=False)
    assert np.isfinite(r.train_loss)
    # ε matches the plan's own composition at the realized count
    expected = ddp.distributed_epsilon(eng._dist_plan, 1, 1e-5, realized=4)
    assert eng.rdp_accountant.get_epsilon(1e-5) == pytest.approx(
        expected, rel=1e-9)
    assert r.epsilon_spent == pytest.approx(expected)
    ledger = eng.accountant.get_privacy_ledger()
    assert ledger[0]["metadata"]["mode"] == "distributed"
    assert ledger[0]["metadata"]["realized_clients"] == 4


def test_aggregate_skellam_noise_matches_summed_shares():
    """dist_fuse_noise correctness: Sk(m·μ_local) drawn once must have the
    same moments as m summed per-client Sk(μ_local) shares (closure)."""
    lam_local, m = 8.0, 16
    fused = np.asarray(ddp.aggregate_skellam_noise(
        prng.root_key(3), m * lam_local, 200_000), np.float64)
    summed = np.asarray(ddp.skellam_noise(_keys(m, seed=4), lam_local,
                                          200_000), np.float64).sum(axis=0)
    assert abs(fused.mean()) < 0.5 and abs(summed.mean()) < 0.5
    assert fused.var() == pytest.approx(2 * m * lam_local, rel=0.02)
    assert summed.var() == pytest.approx(2 * m * lam_local, rel=0.02)


@pytest.mark.parametrize("fuse", [True, False])
def test_distributed_matches_client_dp_at_negligible_noise(mnist, fuse):
    """With z→0 and a fine grid, a distributed round must coincide with a
    client_dp round (identical clip + fixed-denominator mean) up to the
    quantization residue — in both noise formulations."""
    d = make_engine(mnist, epsilon=1e9, z=1e-4, bits=16, seed=3, fuse=fuse)
    c = make_engine(mnist, epsilon=1e9, z=1e-4, seed=3, dp_mode="client_dp")
    mask = np.ones(4, np.float32)
    d.run_round(mask=mask, evaluate=False)
    c.run_round(mask=mask, evaluate=False)
    wd, wc = d.get_model_weights(), c.get_model_weights()
    for k in wd:
        np.testing.assert_allclose(np.asarray(wd[k]), np.asarray(wc[k]),
                                   atol=5e-4)


def test_distributed_noise_is_real_and_scales(mnist):
    quiet = make_engine(mnist, epsilon=1e9, z=0.1, seed=5)
    loud = make_engine(mnist, epsilon=1e9, z=10.0, seed=5)
    mask = np.ones(4, np.float32)
    rq = quiet.run_round(mask=mask, evaluate=False)
    rl = loud.run_round(mask=mask, evaluate=False)
    wq, wl = quiet.get_model_weights(), loud.get_model_weights()
    assert any(not np.allclose(np.asarray(wq[k]), np.asarray(wl[k]))
               for k in wq)
    # loud noise must cost LESS epsilon
    assert rl.epsilon_spent < rq.epsilon_spent


def test_distributed_trains_at_generous_budget(mnist):
    """Mechanism-plumbing convergence check. Noise must be small relative
    to the clipped signal: the per-round noise NORM is z·c·√d/m̄, so with
    m̄=4 clients and d≈422k useful training needs z ≪ 4/√d ≈ 0.006 — the
    few-client regime is exactly why distributed DP targets large cohorts
    (where z=O(1) costs √d/m̄ ≪ 1). Headline-scale runs live in docs."""
    eng = make_engine(mnist, epsilon=1e9, z=1e-3, seed=1)
    first = eng.run_round(evaluate=False)
    last = None
    for _ in range(4):
        last = eng.run_round(evaluate=False)
    assert last.train_loss < first.train_loss


def test_distributed_budget_exhaustion(mnist):
    eng = make_engine(mnist, epsilon=4.0, z=1.0)
    with pytest.raises(PrivacyError):
        for _ in range(50):
            eng.run_round(evaluate=False)
    assert eng.rdp_accountant.get_epsilon(1e-5) <= 4.0 + 1e-9


def test_distributed_fused_rounds_match_accounting(mnist):
    masks = np.ones((2, 4), np.float32)
    fused = make_engine(mnist, epsilon=20.0, z=1.0, seed=9)
    looped = make_engine(mnist, epsilon=20.0, z=1.0, seed=9)
    fused.run_rounds_fused(2, masks=masks, evaluate=False)
    for i in range(2):
        looped.run_round(mask=masks[i], evaluate=False)
    assert fused.rdp_accountant.get_epsilon(1e-5) == pytest.approx(
        looped.rdp_accountant.get_epsilon(1e-5), rel=1e-12)
    wf, wl = fused.get_model_weights(), looped.get_model_weights()
    for k in wf:
        np.testing.assert_allclose(np.asarray(wf[k]), np.asarray(wl[k]),
                                   rtol=1e-5, atol=1e-6)


def test_distributed_on_mesh_matches_single_device(mnist, mesh8):
    """The integer pipeline is mesh-layout-invariant: per-client keys by
    global id, and the int32 modular psum is exactly associative — the
    sharded round must match the single-device round bit-for-bit (modulo
    the f32 decode)."""
    single = make_engine(mnist, epsilon=50.0, z=1.0, seed=2, num_clients=8)
    sharded = make_engine(mnist, epsilon=50.0, z=1.0, seed=2, num_clients=8,
                          mesh=mesh8)
    mask = np.ones(8, np.float32)
    r1 = single.run_round(mask=mask, evaluate=False)
    r2 = sharded.run_round(mask=mask, evaluate=False)
    assert r1.epsilon_spent == pytest.approx(r2.epsilon_spent)
    # tolerance: one grid unit over the m̄ denominator — an ulp-level
    # local-training difference (mesh vs single-device fusion) can flip a
    # coordinate across a stochastic-rounding boundary; anything larger
    # would mean the integer pipeline itself diverged
    atol = single._dist_plan.gamma / 8 * 1.01
    w1, w2 = single.get_model_weights(), sharded.get_model_weights()
    for k in w1:
        np.testing.assert_allclose(np.asarray(w1[k]), np.asarray(w2[k]),
                                   atol=atol)


def test_distributed_checkpoint_resume(mnist, tmp_path):
    from fl_tpu.orchestration.checkpoint import (
        restore_engine_checkpoint,
        save_engine_checkpoint,
    )

    eng = make_engine(mnist, epsilon=20.0, z=1.0, seed=4)
    eng.run_round(evaluate=False)
    eng.run_round(evaluate=False)
    save_engine_checkpoint(eng, str(tmp_path))
    fresh = make_engine(mnist, epsilon=20.0, z=1.0, seed=4)
    restore_engine_checkpoint(fresh, str(tmp_path))
    assert fresh.round_number == 2
    assert fresh.rdp_accountant.get_epsilon(1e-5) == pytest.approx(
        eng.rdp_accountant.get_epsilon(1e-5), rel=1e-12)
    mask = np.ones(4, np.float32)
    ra = eng.run_round(mask=mask, evaluate=False)
    rb = fresh.run_round(mask=mask, evaluate=False)
    assert ra.train_loss == pytest.approx(rb.train_loss, rel=1e-6)


# ===========================================================================
# Wire composition: distributed-DP integer payloads through the full
# Bonawitz protocol (secagg_wire mask_integer_payload / unmask_integer_sum)
# ===========================================================================

def _wire_parties(n, threshold=None, rn=5):
    from fl_tpu.services.secagg_wire import (
        SecAggClientSession,
        SecAggServerRound,
        generate_keypair,
    )

    ids = sorted(f"c{i}" for i in range(n))
    kp = {cid: generate_keypair() for cid in ids}
    srv = SecAggServerRound(rn, [(cid, kp[cid][1]) for cid in ids],
                            threshold=threshold)
    sessions = {
        cid: SecAggClientSession(cid, kp[cid][0], rn, srv.roster,
                                 srv.nonce, srv.threshold, srv.frac_bits)
        for cid in ids
    }
    for cid in ids:
        srv.add_share_upload(cid, sessions[cid].make_share_uploads())
    for cid in ids:
        sessions[cid].receive_shares(srv.shares_for(cid))
    return ids, srv, sessions


def _clip_flat(weights, c):
    keys = sorted(weights)
    flat = np.concatenate([np.asarray(weights[k], np.float64).ravel()
                           for k in keys])
    n = np.linalg.norm(flat)
    return flat * min(1.0, c / n) if n > 0 else flat


def _wire_round(n_clients, plan, drop=None, seed=0, rn=5):
    from fl_tpu.core.types import ModelUpdate

    ids, srv, sessions = _wire_parties(
        n_clients, threshold=max(2, n_clients - 1), rn=rn)
    rng = np.random.default_rng(seed)
    true = {cid: {"w": rng.normal(0, 0.3, (6, 4)).astype(np.float32),
                  "b": rng.normal(0, 0.3, (4,)).astype(np.float32)}
            for cid in ids}
    updates = []
    for cid in ids:
        payload = ddp.host_client_integer_payload(
            true[cid], plan, np.random.default_rng(hash(cid) % 2 ** 31))
        masked = sessions[cid].mask_integer_payload(payload)
        assert masked["w"].dtype == np.uint32
        if cid == drop:
            continue  # died after masking, payload never arrived
        updates.append(ModelUpdate(client_id=cid, round_number=rn,
                                   model_weights=masked, num_samples=1,
                                   training_loss=0.0))
    survivors = [u.client_id for u in updates]
    srv.freeze_survivors(survivors)
    for cid in survivors:
        srv.add_reveal(cid, sessions[cid].reveal(srv.survivors, srv.dropped))
    summed, got_survivors = srv.unmask_integer_sum(updates)
    assert got_survivors == sorted(survivors)
    avg = ddp.host_decode_average(summed, plan)
    expect_flat = sum(_clip_flat(true[cid], plan.clip_norm)
                      for cid in survivors) / plan.expected_clients
    got_flat = np.concatenate([avg[k].ravel()
                               for k in sorted(avg)]).astype(np.float64)
    return got_flat, expect_flat, len(survivors)


def test_wire_integer_protocol_noiseless_is_exact_to_rounding():
    """z=0: the decoded average must equal the clipped-delta mean up to
    stochastic-rounding residue only (≤ γ·m/m̄ per coordinate)."""
    plan = ddp.DistributedDPPlan(1.0, 12, 28, 4, 0.0)
    got, expect, m = _wire_round(4, plan)
    assert np.abs(got - expect).max() <= plan.gamma * m / 4 + 1e-12


def test_wire_integer_protocol_noise_has_calibrated_scale():
    plan = ddp.DistributedDPPlan(1.0, 12, 28, 4, 2.0)
    got, expect, m = _wire_round(4, plan, seed=3)
    resid = got - expect
    sigma = plan.central_sigma_float(m)
    # 28 coords: the residual std should be the calibrated σ (loose CLT
    # band) and nothing should be wildly outside the tail
    assert 0.4 * sigma < resid.std() < 2.0 * sigma
    assert np.abs(resid).max() < 6 * sigma + plan.gamma


def test_wire_integer_protocol_dropout_recovers_and_accounts():
    """A client dying after masking: Shamir recovery salvages the round;
    the decoded sum carries only the SURVIVORS' noise shares, so ε must be
    charged at the survivor count (strictly more than full participation)."""
    plan = ddp.DistributedDPPlan(1.0, 12, 28, 4, 1.0)
    got, expect, m = _wire_round(4, plan, drop="c2", seed=7)
    assert m == 3
    sigma = plan.central_sigma_float(3)
    assert np.abs(got - expect).max() < 8 * sigma + plan.gamma
    eps_full = ddp.distributed_epsilon(plan, 1, 1e-5, realized=4)
    eps_drop = ddp.distributed_epsilon(plan, 1, 1e-5, realized=3)
    assert eps_drop > eps_full


def test_wire_integer_payload_rejects_float_dtype():
    ids, srv, sessions = _wire_parties(2)
    with pytest.raises(ValueError, match="dtype"):
        sessions[ids[0]].mask_integer_payload(
            {"w": np.zeros((2, 2), np.float32)})


def test_distributed_dp_grpc_round_e2e():
    """Full deployment loop: FederatedTrainer(distributed_dp=True) clients
    against a FederatedLearningServicer(distributed_dp=True) coordinator
    over live gRPC — integer Skellam payloads ride the Bonawitz masked
    pipeline, the coordinator decodes only the modular sum and applies the
    average delta."""
    from fl_tpu.orchestration.simulation import (
        FederatedLearningSimulation,
        SimulationConfig,
    )

    sim = FederatedLearningSimulation(SimulationConfig(
        dataset="mnist", num_clients=2, num_rounds=1,
        target_accuracy=0.999, backend="grpc",
        n_train_synth=128, n_test_synth=32,
        local_epochs=1, batch_size=8,
        privacy_epsilon=1e6, privacy_delta=1e-6, dp_mode="none",
        noise_multiplier=0.05, timeout_s=300,
        heterogeneous_clients=False,
        secure_aggregation=True, distributed_dp=True,
    ))
    results = sim.run_simulation()
    assert results["rounds_completed"] >= 1
    for status in results["client_results"].values():
        assert status["rounds_completed"] >= 1
        # the ddp ledger charged a Skellam-RDP epsilon, not eps_r
        assert status["history"][0]["epsilon_used"] > 0
    # per-client metrics withheld under the masked pipeline
    assert results["final_accuracy"] is None


def test_trainer_ddp_validation():
    from fl_tpu.services.federated_trainer import FederatedTrainer

    with pytest.raises(ValueError, match="secure_aggregation"):
        FederatedTrainer(client_id="x", distributed_dp=True,
                         privacy=PrivacyConfig(1.0, 1e-5))
    with pytest.raises(ValueError, match="PrivacyConfig"):
        FederatedTrainer(client_id="x", distributed_dp=True,
                         secure_aggregation=True)


def test_servicer_ddp_validation():
    from fl_tpu.core.types import RoundConfig
    from fl_tpu.services.grpc_server import FederatedLearningServicer

    with pytest.raises(ValueError, match="secure_aggregation"):
        FederatedLearningServicer(distributed_dp=True)
    with pytest.raises(ValueError, match="privacy_config"):
        FederatedLearningServicer(
            round_config=RoundConfig(), secure_aggregation=True,
            distributed_dp=True)


def test_distributed_config_validation(mnist):
    with pytest.raises(ValueError, match="secure_aggregation|mod 2"):
        model = create_model("simple_cnn")
        fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                                   samples_per_client=32, seed=0)
        FederatedRoundEngine(model, fa, RoundEngineConfig(
            training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
            dp_mode="distributed", secure_aggregation=True,
            privacy=PrivacyConfig(1.0, 1e-5), max_clients=4))
    with pytest.raises(ValueError, match="uplink"):
        model = create_model("simple_cnn")
        fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                                   samples_per_client=32, seed=0)
        FederatedRoundEngine(model, fa, RoundEngineConfig(
            training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
            dp_mode="distributed", uplink_compression="int8",
            privacy=PrivacyConfig(1.0, 1e-5), max_clients=4))


def test_servicer_wire_plan_refuses_int32_wraparound():
    """Round-4 adversarial review: the deployment (gRPC) decode path must
    certify int32 headroom exactly like the on-chip engine does at config
    time — a 4096-strong roster at dist_bits=20 puts the modular sum's
    12-sigma envelope past 2^31 and must be refused BEFORE decoding."""
    from fl_tpu.core.types import RoundConfig
    from fl_tpu.services.grpc_server import FederatedLearningServicer

    servicer = FederatedLearningServicer(
        round_config=RoundConfig(
            privacy_config=PrivacyConfig(1.0, 1e-5, max_grad_norm=1.0,
                                         noise_multiplier=0.3)),
        secure_aggregation=True, distributed_dp=True, ddp_bits=20)
    # comfortable headroom at a realistic roster passes
    servicer._ddp_plan(dim=421_770, roster_len=16)
    with pytest.raises(ValueError, match="overflow"):
        servicer._ddp_plan(dim=421_770, roster_len=4096)
