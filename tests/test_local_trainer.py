"""Host-side LocalTrainer facade tests: val split, early stopping,
checkpoints, evaluation (ref API: LocalTrainer, training.py:28-404)."""

import jax
import numpy as np
import pytest

from fl_tpu.data import load_dataset
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.fl.local_trainer import LocalTrainer, validate_training_data
from fl_tpu.models import create_model


@pytest.fixture(scope="module")
def setup():
    splits = load_dataset("mnist", n_train_synth=512, n_test_synth=128)
    model = create_model("simple_cnn")
    variables = model.init(jax.random.PRNGKey(0))
    return splits, model, variables


def test_train_with_validation_split(setup):
    splits, model, variables = setup
    trainer = LocalTrainer(model, FederatedTrainingConfig(
        local_epochs=2, batch_size=16, validation_split=0.2))
    new_vars, summary = trainer.train_local_model(
        variables, splits.train_images[:256], splits.train_labels[:256],
        splits.mean, splits.std)
    assert summary["epochs_completed"] == 2
    assert summary["final_val_loss"] is not None
    assert len(summary["history"]) == 2
    # the model moved
    w0 = model.get_model_weights(variables)
    w1 = model.get_model_weights(new_vars)
    assert any(not np.allclose(np.asarray(w0[k]), np.asarray(w1[k]))
               for k in w0)


def test_early_stopping_triggers(setup):
    splits, model, variables = setup
    trainer = LocalTrainer(model, FederatedTrainingConfig(
        local_epochs=30, batch_size=16, validation_split=0.25,
        early_stopping_patience=1, learning_rate=2.0))  # lr huge: diverges
    _, summary = trainer.train_local_model(
        variables, splits.train_images[:128], splits.train_labels[:128],
        splits.mean, splits.std)
    assert summary["epochs_completed"] < 30


def test_checkpoint_roundtrip(setup, tmp_path):
    splits, model, variables = setup
    trainer = LocalTrainer(model, FederatedTrainingConfig(
        local_epochs=1, batch_size=16, save_checkpoints=True),
        checkpoint_dir=str(tmp_path))
    new_vars, _ = trainer.train_local_model(
        variables, splits.train_images[:64], splits.train_labels[:64],
        splits.mean, splits.std)
    assert (tmp_path / "latest_checkpoint.npz").exists()
    restored, meta = trainer.load_checkpoint(variables)
    assert meta["epoch"] == 0
    wr = model.get_model_weights(restored)
    wn = model.get_model_weights(new_vars)
    for k in wn:
        np.testing.assert_array_equal(np.asarray(wr[k]), np.asarray(wn[k]))


def test_evaluate_model_per_class(setup):
    splits, model, variables = setup
    trainer = LocalTrainer(model)
    ev = trainer.evaluate_model(variables, splits.test_images,
                                splits.test_labels, splits.mean, splits.std)
    assert 0.0 <= ev["accuracy"] <= 1.0
    assert len(ev["per_class_accuracy"]) == 10


def test_validate_training_data(setup):
    splits, *_ = setup
    ok = validate_training_data(splits.train_images[:64],
                                splits.train_labels[:64])
    assert ok["valid"] and ok["num_samples"] == 64
    bad = validate_training_data(splits.train_images[:4],
                                 np.asarray([0, 1, 99, 2]))
    assert not bad["valid"]
    assert "labels out of range" in bad["problems"]
