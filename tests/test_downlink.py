"""Downlink (broadcast) compression (RoundEngineConfig
.downlink_compression): clients train from a lossily-compressed global
model; deltas are measured against it and applied to the full-precision
master. Capability extension — the reference broadcasts full weights
every round (src/coordinator/grpc_server.py:136-176)."""

import dataclasses

import flax.linen as nn
import jax
import numpy as np
import pytest

from fl_tpu.core.types import PrivacyConfig
from fl_tpu.data.federated import FederatedArrays
from fl_tpu.data.synthetic import synthetic_mnist
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models.base import FLModel
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig


class TinyMLP(nn.Module):
    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(16, name="fc1")(x))
        return nn.Dense(10, name="fc2")(x)


def tiny_model():
    return FLModel(module=TinyMLP(), name="tiny", input_shape=(28, 28, 1),
                   num_classes=10)


def make_data(C=4, n=32, seed=0):
    xtr, ytr, _, _ = synthetic_mnist(n_train=C * n, n_test=1, seed=seed)
    return FederatedArrays(
        images=xtr.reshape(C, n, 28, 28, 1),
        labels=ytr.reshape(C, n).astype(np.int32),
        num_samples=np.full(C, n, np.int32),
        mean=np.asarray([0.1307], np.float32),
        std=np.asarray([0.3081], np.float32), num_classes=10)


def cfg(**kw):
    return RoundEngineConfig(
        training=FederatedTrainingConfig(
            local_epochs=2, batch_size=16, learning_rate=0.05,
            optimizer_type="sgd"),
        seed=0, **kw)


def params_of(e):
    return jax.tree.map(np.asarray, e.global_variables)


def test_master_never_absorbs_quantization_error():
    """Zero local work ⇒ zero deltas ⇒ the full-precision master must be
    BIT-identical after a downlink-compressed round (the compressed θ̂ is
    what clients saw, not what the server keeps)."""
    data = make_data()
    eng = FederatedRoundEngine(tiny_model(), data,
                               cfg(downlink_compression="int8"))
    eng.epochs_per_client = np.zeros(4, np.int32)
    before = params_of(eng)
    eng.run_round(evaluate=False)
    after = params_of(eng)
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(b, a)


def test_int8_downlink_changes_trajectory_but_still_learns():
    data = make_data(C=8, n=64)
    accs = {}
    finals = {}
    for mode in ("none", "int8"):
        eng = FederatedRoundEngine(tiny_model(), data,
                                   cfg(downlink_compression=mode))
        results = eng.run(4)
        accs[mode] = [r.train_accuracy for r in results]
        finals[mode] = params_of(eng)
    # int8 broadcast genuinely perturbs the trajectory...
    diffs = [np.max(np.abs(a - b)) for a, b in
             zip(jax.tree.leaves(finals["none"]),
                 jax.tree.leaves(finals["int8"]))]
    assert max(diffs) > 1e-6
    # ...but training still progresses
    assert accs["int8"][-1] > accs["int8"][0] + 0.1


def test_downlink_composes_with_uplink_and_delta_dp():
    data = make_data(C=4, n=32)
    eng = FederatedRoundEngine(
        tiny_model(), data,
        cfg(downlink_compression="bfloat16", uplink_compression="int8",
            dp_mode="delta",
            privacy=PrivacyConfig(epsilon=8.0, delta=1e-5,
                                  max_grad_norm=1.0),
            epsilon_per_round=2.0, delta_per_round=2e-6))
    for _ in range(2):
        res = eng.run_round(evaluate=False)
        assert np.isfinite(res.train_loss)
    for leaf in jax.tree.leaves(params_of(eng)):
        assert np.isfinite(leaf).all()


def test_downlink_mesh_equality(mesh8):
    data = make_data(C=8)

    def run(mesh):
        e = FederatedRoundEngine(tiny_model(), data,
                                 cfg(downlink_compression="int8"),
                                 mesh=mesh)
        e.run_round(evaluate=False)
        return params_of(e)

    a, b = run(None), run(mesh8)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(x, y, rtol=2e-5, atol=2e-6)


def test_downlink_composition_guards():
    data = make_data()
    m = tiny_model()
    with pytest.raises(ValueError, match="not in"):
        FederatedRoundEngine(m, data, cfg(downlink_compression="int4"))
    with pytest.raises(ValueError, match="FedAvg"):
        FederatedRoundEngine(m, data, cfg(downlink_compression="int8",
                                          aggregation="median"))
    with pytest.raises(ValueError, match="FedAvg"):
        FederatedRoundEngine(m, data, cfg(downlink_compression="int8",
                                          secure_aggregation=True))
    with pytest.raises(ValueError, match="scaffold|dp_ftrl"):
        FederatedRoundEngine(m, data, cfg(downlink_compression="int8",
                                          scaffold=True))
