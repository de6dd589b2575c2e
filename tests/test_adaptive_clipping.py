"""Adaptive clipping (Andrew et al. 2021) for client-level DP-FedAvg.

The reference has no adaptive clipping (its clip norm is the static
PrivacyConfig.max_grad_norm, src/shared/privacy.py:95-168); this is a
capability extension: the client_dp central clip norm tracks the
clip_quantile-quantile of client delta norms via a DP-noised clipped-count,
with the count's privacy cost folded into the aggregate noise so the RDP
accounting is unchanged (fl_tpu.fl.privacy.adaptive_clip_delta_multiplier).
"""

import numpy as np
import pytest

from fl_tpu.core.types import PrivacyConfig
from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl.accounting import compute_epsilon
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.fl.privacy import (
    PrivacyError,
    adaptive_clip_delta_multiplier,
    geometric_clip_update,
    noisy_clipped_fraction,
)
from fl_tpu.models import create_model
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig


@pytest.fixture(scope="module")
def mnist():
    return load_dataset("mnist", n_train_synth=256, n_test_synth=64)


def make_engine(mnist, init_clip=1.0, z=1.0, count_stddev=2.0,
                quantile=0.5, clip_lr=0.2, participation=1.0,
                num_clients=8, seed=0, mesh=None, adaptive=True,
                epsilon=100.0):
    model = create_model("simple_cnn")
    fa = make_federated_arrays(mnist, num_clients=num_clients,
                               strategy="iid", samples_per_client=16,
                               seed=seed)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
        dp_mode="client_dp",
        privacy=PrivacyConfig(epsilon=epsilon, delta=1e-5,
                              max_grad_norm=init_clip, noise_multiplier=z),
        participation_rate=participation,
        adaptive_clipping=adaptive,
        clip_quantile=quantile,
        clip_lr=clip_lr,
        clip_count_stddev=count_stddev,
        seed=seed,
    )
    return FederatedRoundEngine(model, fa, cfg, mesh=mesh)


# ---------------------------------------------------------------------------
# pure math
# ---------------------------------------------------------------------------

def test_delta_multiplier_formula():
    # z_Δ must exceed z (the aggregate pays for the count release) and
    # approach z as the count noise grows
    z = 1.0
    assert adaptive_clip_delta_multiplier(z, 2.0) > z
    assert adaptive_clip_delta_multiplier(z, 1e6) == pytest.approx(z,
                                                                   rel=1e-6)
    # closed form: z_Δ = (z⁻² − (2σ_b)⁻²)^(−1/2)
    got = adaptive_clip_delta_multiplier(1.0, 1.0)
    assert got == pytest.approx((1.0 - 0.25) ** -0.5)


def test_delta_multiplier_infeasible_raises():
    # needs 2σ_b > z
    with pytest.raises(PrivacyError):
        adaptive_clip_delta_multiplier(2.0, 0.5)
    with pytest.raises(PrivacyError):
        adaptive_clip_delta_multiplier(1.0, 0.0)


def test_geometric_update_fixed_point():
    import jax.numpy as jnp

    c = jnp.float32(3.0)
    # at the target quantile the clip norm is a fixed point
    assert float(geometric_clip_update(c, jnp.float32(0.5), 0.5, 0.2)) \
        == pytest.approx(3.0)
    # over-clipping fraction shrinks C, under-clipping grows it
    assert float(geometric_clip_update(c, jnp.float32(1.0), 0.5, 0.2)) < 3.0
    assert float(geometric_clip_update(c, jnp.float32(0.0), 0.5, 0.2)) > 3.0


def test_noisy_fraction_centering():
    import jax
    import jax.numpy as jnp

    # with zero noise the estimate is exact: all 4 of 4 participants under
    # the clip -> centered sum 2.0 -> fraction 1.0
    frac = noisy_clipped_fraction(
        jnp.float32(2.0), 4.0, 1e-9, jax.random.PRNGKey(0))
    assert float(frac) == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------------------------------
# engine behavior
# ---------------------------------------------------------------------------

def test_adaptive_requires_client_dp(mnist):
    with pytest.raises(ValueError, match="client_dp"):
        model = create_model("simple_cnn")
        fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                                   samples_per_client=16, seed=0)
        FederatedRoundEngine(model, fa, RoundEngineConfig(
            training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
            dp_mode="delta", privacy=PrivacyConfig(1.0, 1e-5),
            adaptive_clipping=True,
        ))


def test_infeasible_count_noise_raises_at_init(mnist):
    # z=2 with σ_b=0.5 violates 2σ_b > z — caught at engine construction
    with pytest.raises(PrivacyError):
        make_engine(mnist, z=2.0, count_stddev=0.5)


def test_clip_tracks_down_when_initialized_too_high(mnist):
    """C₀ = 100 dwarfs every real delta norm -> clipped fraction ≈ 1 >
    γ = 0.5 -> the geometric update must shrink C round over round."""
    eng = make_engine(mnist, init_clip=100.0, clip_lr=0.5, seed=3)
    clips = [eng.clip_norm]
    for _ in range(4):
        r = eng.run_round(evaluate=False)
        clips.append(eng.clip_norm)
        assert r.clip_norm == pytest.approx(clips[-2])  # C used this round
    assert clips[-1] < clips[0] * 0.5
    assert all(c > 0 for c in clips)


def test_clip_tracks_up_when_initialized_too_low(mnist):
    """C₀ = 1e-3 clips everyone -> fraction ≈ 0 < γ -> C must grow."""
    eng = make_engine(mnist, init_clip=1e-3, clip_lr=0.5, seed=4)
    c0 = eng.clip_norm
    for _ in range(4):
        eng.run_round(evaluate=False)
    assert eng.clip_norm > c0 * 1.5


def test_accounting_identical_to_nonadaptive(mnist):
    """Theorem 1 folds the count release into the aggregate noise: the
    RDP ledger must charge exactly the non-adaptive subsampled-Gaussian
    ε at the SAME noise multiplier z."""
    eng = make_engine(mnist, z=1.0, participation=0.5, seed=0)
    eng.run_round(evaluate=False)
    eps = eng.rdp_accountant.get_epsilon(1e-5)
    expected = compute_epsilon(1, q=0.5, noise_multiplier=1.0, delta=1e-5)
    assert eps == pytest.approx(expected, rel=1e-9)


def test_aggregate_noise_is_inflated(mnist):
    """The realized σ must use z_Δ > z (the price of the count release)."""
    eng = make_engine(mnist, z=1.0, count_stddev=2.0, num_clients=8)
    eng.run_round(evaluate=False)
    z_delta = adaptive_clip_delta_multiplier(1.0, 2.0)
    ledger = eng.accountant.get_privacy_ledger()
    # σ = z_Δ·C/m̄ with C = 1.0, m̄ = 8
    assert ledger[0]["noise_scale"] == pytest.approx(z_delta * 1.0 / 8.0,
                                                     rel=1e-5)


def test_fused_rounds_reject_adaptive(mnist):
    eng = make_engine(mnist)
    with pytest.raises(ValueError, match="adaptive_clipping"):
        eng.run_rounds_fused(2)


def test_checkpoint_roundtrip_preserves_clip(tmp_path, mnist):
    from fl_tpu.orchestration.checkpoint import (
        restore_engine_checkpoint,
        save_engine_checkpoint,
    )

    eng = make_engine(mnist, init_clip=100.0, clip_lr=0.5, seed=7)
    eng.run_round(evaluate=False)
    eng.run_round(evaluate=False)
    tracked = eng.clip_norm
    assert tracked != 100.0
    save_engine_checkpoint(eng, str(tmp_path))

    fresh = make_engine(mnist, init_clip=100.0, clip_lr=0.5, seed=7)
    assert fresh.clip_norm == 100.0
    restore_engine_checkpoint(fresh, str(tmp_path))
    assert fresh.clip_norm == pytest.approx(tracked)
    assert fresh.round_number == 2


def test_adaptive_on_mesh_matches_single_device(mnist, mesh8):
    """The quantile estimate reduces per-shard partial sums with psum and
    noises once with a replicated key — sharded and unsharded runs must
    agree on both the model and the tracked clip norm."""
    single = make_engine(mnist, init_clip=10.0, clip_lr=0.5, seed=11)
    sharded = make_engine(mnist, init_clip=10.0, clip_lr=0.5, seed=11,
                          mesh=mesh8)
    mask = np.ones(8, np.float32)
    r1 = single.run_round(mask=mask, evaluate=False)
    r2 = sharded.run_round(mask=mask, evaluate=False)
    assert single.clip_norm == pytest.approx(sharded.clip_norm, rel=1e-5)
    assert r1.train_loss == pytest.approx(r2.train_loss, rel=1e-5)
    w1, w2 = single.get_model_weights(), sharded.get_model_weights()
    for k in w1:
        np.testing.assert_allclose(np.asarray(w1[k]), np.asarray(w2[k]),
                                   rtol=1e-4, atol=1e-5)
