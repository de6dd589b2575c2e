"""run_rounds_pipelined == a run_round loop, exactly.

The pipelined runner (round r+1 dispatched before round r's metrics are
read back — fl_tpu/orchestration/round_engine.py) must be a pure latency
optimization: same per-round program, same host bookkeeping, same
results. These tests pin that equivalence on the delta-DP bench shape
and the refusal path for adaptive clipping (whose clip norm is a
metrics-derived host carry that cannot be pipelined).
"""

import numpy as np
import pytest

from fl_tpu.core.types import PrivacyConfig
from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models import create_model
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig


def _engine(seed=0, **kw):
    splits = load_dataset("mnist", n_train_synth=256, n_test_synth=64)
    fa = make_federated_arrays(splits, num_clients=4, strategy="iid",
                               samples_per_client=32, seed=seed)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=1, batch_size=16),
        dp_mode="delta",
        privacy=PrivacyConfig(epsilon=8.0, delta=1e-5, max_grad_norm=1.0),
        epsilon_per_round=0.5,
        delta_per_round=1e-7,
        min_clients=2,
        seed=seed,
        **kw,
    )
    return FederatedRoundEngine(create_model("simple_cnn"), fa, cfg)


def test_pipelined_matches_sequential():
    rounds = 4
    seq = _engine()
    masks = np.stack([seq.sample_participation() for _ in range(rounds)])
    seq_results = [seq.run_round(mask=masks[r], evaluate=False)
                   for r in range(rounds)]

    pipe = _engine()
    pipe_results = pipe.run_rounds_pipelined(rounds, masks=masks)

    assert len(pipe_results) == rounds
    for a, b in zip(seq_results, pipe_results):
        assert a.round_number == b.round_number
        assert a.participating_clients == b.participating_clients
        np.testing.assert_allclose(a.train_loss, b.train_loss, rtol=1e-6)
        np.testing.assert_allclose(a.train_accuracy, b.train_accuracy,
                                   rtol=1e-6)
        assert a.epsilon_spent == b.epsilon_spent
    # final global models bit-identical
    import jax

    fa = jax.device_get(seq.global_variables["params"])
    fb = jax.device_get(pipe.global_variables["params"])
    for pa, pb in zip(jax.tree.leaves(fa), jax.tree.leaves(fb)):
        np.testing.assert_array_equal(pa, pb)
    # host accounting identical: budget spent, history length, ledger size
    assert seq.round_number == pipe.round_number
    assert len(seq.history) == len(pipe.history)
    assert (len(seq.accountant.privacy_ledger)
            == len(pipe.accountant.privacy_ledger))


def test_pipelined_refuses_adaptive_clipping():
    splits = load_dataset("mnist", n_train_synth=128, n_test_synth=64)
    fa = make_federated_arrays(splits, num_clients=4, strategy="iid",
                               samples_per_client=16, seed=0)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
        dp_mode="client_dp",
        privacy=PrivacyConfig(epsilon=100.0, delta=1e-5,
                              max_grad_norm=1.0, noise_multiplier=1.0),
        adaptive_clipping=True,
        clip_count_stddev=2.0,
        seed=0,
    )
    eng = FederatedRoundEngine(create_model("simple_cnn"), fa, cfg)
    with pytest.raises(ValueError, match="adaptive_clipping"):
        eng.run_rounds_pipelined(2)


def test_pipelined_budget_exhaustion_raises_at_dispatch():
    """The budget check for round r+1 runs at ITS dispatch, after round
    r's charge — exhaustion still raises even though metrics readbacks
    lag one round behind."""
    from fl_tpu.fl.privacy import PrivacyError

    eng = _engine()
    # budget allows 16 rounds of 0.5; ask for more
    with pytest.raises(PrivacyError):
        eng.run_rounds_pipelined(20)
    # everything dispatched before the refusal was finalized coherently
    assert len(eng.history) == 16
    assert eng.round_number == 16
    assert len(eng.accountant.privacy_ledger) == 16
