"""Mesh-collective equivalence + validator battery + interface conformance
tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.core.mesh import client_sharding, make_mesh
from fl_tpu.fl.fedavg import FedAvgAggregator, fedavg_stacked
from fl_tpu.parallel import fedavg_psum_shard_map
from fl_tpu.validation import (
    PerformanceRequirements,
    PerformanceValidator,
    PrivacyValidator,
    SecurityValidator,
)


def test_shard_map_fedavg_matches_jit_path(mesh8):
    """The explicit psum formulation must match the compiler-scheduled
    reduction bit-for-bit-ish (f32 tolerance)."""
    C = 16
    rng = np.random.default_rng(0)
    stacked = {
        "a": jnp.asarray(rng.normal(size=(C, 8, 16)), jnp.float32),
        "b": {"c": jnp.asarray(rng.normal(size=(C, 32)), jnp.float32)},
    }
    counts = jnp.asarray(rng.integers(10, 100, size=C), jnp.float32)
    mask = jnp.asarray(rng.random(C) > 0.3, jnp.float32)

    expected = fedavg_stacked(stacked, counts, mask)

    sh = client_sharding(mesh8)
    stacked_sh = jax.tree.map(lambda x: jax.device_put(x, sh), stacked)
    got = fedavg_psum_shard_map(mesh8, stacked_sh,
                                jax.device_put(counts, sh),
                                jax.device_put(mask, sh))
    for ke, kg in zip(jax.tree.leaves(expected), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(ke), np.asarray(kg),
                                   rtol=1e-5, atol=1e-6)


def test_shard_map_fedavg_all_masked_is_uniform(mesh8):
    C = 8
    stacked = {"w": jnp.ones((C, 4), jnp.float32)
               * jnp.arange(C, dtype=jnp.float32)[:, None]}
    counts = jnp.zeros((C,), jnp.float32)
    out = fedavg_psum_shard_map(mesh8, stacked, counts)
    # zero mass -> result defined by the guard (≈0 rather than NaN)
    assert np.all(np.isfinite(np.asarray(out["w"])))


# --- validators -----------------------------------------------------------------

def test_privacy_validator_noise_band():
    """The reference's [0.5σ, 2σ] statistical check (privacy_validator.py
    :104-108) against the real jnp DP path."""
    v = PrivacyValidator()
    result = v.validate_differential_privacy(dim=8192, trials=2,
                                             use_pallas=False)
    assert result["passed"], result


def test_privacy_validator_budget_accounting():
    v = PrivacyValidator()
    result = v.validate_privacy_budget_tracking()
    assert result["passed"]
    assert result["consumed_epsilon"] == pytest.approx(0.6)


def test_privacy_validator_split_budget():
    v = PrivacyValidator()
    result = v.test_privacy_guarantees(splits=5)
    assert result["passed"]
    assert result["overdraw_refused"]


def test_security_validator_leakage():
    sv = SecurityValidator()
    rng = np.random.default_rng(0)
    sample = rng.normal(size=(16, 16)).astype(np.float32)
    clean = {"w": rng.normal(size=(1024,)).astype(np.float32)}
    assert sv.check_data_leakage(clean, sample)["passed"]
    # a tensor that literally embeds the sample must be flagged
    leaky = {"w": np.concatenate([sample.reshape(-1),
                                  np.zeros(768, np.float32)])}
    assert not sv.check_data_leakage(leaky, sample)["passed"]


def test_security_risk_estimates_monotone():
    sv = SecurityValidator()
    low = sv.estimate_membership_inference_risk(0.1, 1e-6)
    high = sv.estimate_membership_inference_risk(5.0, 1e-3)
    assert low["max_advantage_bound"] < high["max_advantage_bound"]
    inv_low = sv.estimate_model_inversion_risk(0.5, 1000, 100000)
    inv_high = sv.estimate_model_inversion_risk(8.0, 10_000_000, 100)
    assert inv_low["risk_score"] < inv_high["risk_score"]


def test_performance_validator_baseline():
    """Real measured baseline on tiny shapes (CPU-friendly)."""
    v = PerformanceValidator(samples_per_client=16, local_epochs=1,
                             batch_size=8,
                             requirements=PerformanceRequirements(
                                 max_latency_ms=60_000))
    result = v.run_baseline_test(num_clients=2)
    assert result["passed"]
    assert result["rounds_per_sec"] > 0


# --- interface conformance --------------------------------------------------------

def test_protocol_conformance():
    from fl_tpu.core.interfaces import (
        AggregationServiceProtocol,
        CompressionProtocol,
        ModelProtocol,
        PrivacyEngineProtocol,
    )
    from fl_tpu.fl.compression import create_compression_service
    from fl_tpu.fl.privacy import create_privacy_engine
    from fl_tpu.models import create_model

    assert isinstance(FedAvgAggregator(), AggregationServiceProtocol)
    assert isinstance(create_compression_service(), CompressionProtocol)
    assert isinstance(create_privacy_engine(), PrivacyEngineProtocol)
    assert isinstance(create_model("simple_cnn"), ModelProtocol)
