"""Personalization evaluation (per-client fine-tune gain).

Capability extension over the reference (its client evaluates the
downloaded global model directly, src/client/federated_trainer.py:390-426).
"""

import numpy as np
import pytest

from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.fl.personalization import make_personalization_fn
from fl_tpu.models import create_model
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig


@pytest.fixture(scope="module")
def mnist():
    return load_dataset("mnist", n_train_synth=512, n_test_synth=128)


def make_engine(mnist, num_clients=8, strategy="pathological", seed=0,
                mesh=None, epochs=3, lr=0.005):
    model = create_model("simple_cnn")
    fa = make_federated_arrays(mnist, num_clients=num_clients,
                               strategy=strategy, samples_per_client=32,
                               seed=seed)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=epochs, batch_size=8,
                                         learning_rate=lr),
        seed=seed,
    )
    return FederatedRoundEngine(model, fa, cfg, mesh=mesh)


def test_personalization_output_shape_and_split(mnist):
    eng = make_engine(mnist, num_clients=4)
    out = eng.evaluate_personalized(finetune_epochs=1,
                                    finetune_fraction=0.75)
    pc = out["per_client"]
    for k in ("global_accuracy", "personalized_accuracy", "global_loss",
              "personalized_loss", "n_holdout"):
        assert pc[k].shape == (4,)
    # split arithmetic: n_holdout = n - clip(floor(0.75 n), 1, n-1)
    n = np.minimum(np.asarray(eng.data.num_samples), 32)
    expect = n - np.clip((n * 0.75).astype(int), 1, n - 1)
    np.testing.assert_array_equal(pc["n_holdout"], expect)
    assert (pc["n_holdout"] >= 1).all()
    for k in ("mean_global_accuracy", "mean_personalized_accuracy",
              "mean_personalization_gain"):
        assert np.isfinite(out[k])


def test_fraction_validated():
    model = create_model("simple_cnn")
    with pytest.raises(ValueError, match="finetune_fraction"):
        make_personalization_fn(
            model, FederatedTrainingConfig(), 32, (0.5,), (0.5,),
            finetune_fraction=1.0)


def test_finetune_gains_on_pathological_clients(mnist):
    """Pathological non-IID clients (1-2 classes each): fine-tuning on a
    client's own shard must beat the untrained/global model on the
    client's holdout by a wide margin."""
    eng = make_engine(mnist, num_clients=8, strategy="pathological")
    out = eng.evaluate_personalized(finetune_epochs=3,
                                    finetune_fraction=0.8)
    assert out["mean_personalized_accuracy"] > out["mean_global_accuracy"]
    assert out["mean_personalization_gain"] > 0.15


def test_personalization_does_not_mutate_engine(mnist):
    eng = make_engine(mnist, num_clients=4)
    before = eng.get_model_weights()
    eng.evaluate_personalized()
    after = eng.get_model_weights()
    for k in before:
        np.testing.assert_array_equal(np.asarray(before[k]),
                                      np.asarray(after[k]))
    assert eng.round_number == 0


def test_personalization_deterministic(mnist):
    eng = make_engine(mnist, num_clients=4)
    a = eng.evaluate_personalized()
    b = eng.evaluate_personalized()
    np.testing.assert_allclose(a["per_client"]["personalized_accuracy"],
                               b["per_client"]["personalized_accuracy"])


def test_personalization_on_mesh_matches_single_device(mnist, mesh8):
    single = make_engine(mnist, num_clients=8, seed=3)
    sharded = make_engine(mnist, num_clients=8, seed=3, mesh=mesh8)
    a = single.evaluate_personalized(finetune_epochs=2)
    b = sharded.evaluate_personalized(finetune_epochs=2)
    np.testing.assert_allclose(
        a["per_client"]["personalized_accuracy"],
        b["per_client"]["personalized_accuracy"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        a["mean_personalized_accuracy"], b["mean_personalized_accuracy"],
        rtol=1e-4)


def test_single_sample_client_zero_weighted(mnist):
    """n=1 has no valid split: the client must get an EMPTY holdout
    (n_holdout=0, zero weight in summaries), never be scored on its own
    fine-tune sample."""
    from fl_tpu.data import make_federated_arrays as mfa

    model = create_model("simple_cnn")
    fa = mfa(mnist, num_clients=4, strategy="iid", samples_per_client=8,
             seed=0)
    fa.num_samples = np.array([1, 8, 8, 8], np.int32)  # client 0: n=1
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=1, batch_size=4),
        seed=0)
    eng = FederatedRoundEngine(model, fa, cfg)
    out = eng.evaluate_personalized(finetune_fraction=0.75)
    pc = out["per_client"]
    assert pc["n_holdout"][0] == 0
    # summary weights renormalize over the remaining clients
    assert np.isfinite(out["mean_personalized_accuracy"])


def test_personalization_after_training_round(mnist):
    """The protocol runs at the current global model — after a round the
    round_number-keyed PRNG gives fresh fine-tune shuffles and the call
    still works on the trained state."""
    eng = make_engine(mnist, num_clients=4, strategy="iid")
    eng.run_round(evaluate=False)
    out = eng.evaluate_personalized(finetune_epochs=1)
    assert np.isfinite(out["mean_personalization_gain"])
