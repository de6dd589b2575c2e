"""BASELINE config #4 (CIFAR-10 + augmentation + compression over the wire),
DP-SGD engine mode with RDP accounting, and failure-handler-driven
participation."""

import numpy as np
import pytest

from fl_tpu.core.types import ModelUpdate, PrivacyConfig
from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl.compression import create_compression_service
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.fl.privacy import PrivacyError
from fl_tpu.models import get_model_for_dataset
from fl_tpu.ops.preprocess import make_cifar_augment
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig
from fl_tpu.orchestration.failure import FailureHandler, FailureType


def test_config4_cifar10_with_augment_and_compression():
    """CIFAR10CNN (BatchNorm model) + on-device augmentation; the round's
    update survives a quantization round trip through the proto wire."""
    splits = load_dataset("cifar10", n_train_synth=256, n_test_synth=64)
    arrays = make_federated_arrays(splits, num_clients=2, strategy="iid",
                                   samples_per_client=32, seed=0)
    model = get_model_for_dataset("cifar10")
    eng = FederatedRoundEngine(
        model, arrays,
        RoundEngineConfig(
            training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
            seed=0,
        ),
        augment_fn=make_cifar_augment(),
    )
    r = eng.run_round(evaluate=False)
    assert np.isfinite(r.train_loss)
    # BatchNorm stats were carried and aggregated
    assert "batch_stats" in eng.global_variables

    # compress the aggregated weights, ship through the proto, decompress
    weights = {k: np.asarray(v) for k, v in eng.get_model_weights().items()}
    svc = create_compression_service("quantization", bits=8)
    payload, meta = svc.compress_weights(weights)
    assert meta["compression_ratio"] < 0.5

    from fl_tpu.services import federated_learning_pb2 as pb
    from fl_tpu.services.grpc_utils import ProtobufConverter

    conv = ProtobufConverter()
    restored_weights = svc.decompress_weights(payload, meta)
    update = ModelUpdate(client_id="cifar_c0", round_number=0,
                         model_weights=restored_weights, num_samples=32,
                         training_loss=float(r.train_loss))
    blob = conv.model_update_to_proto(update).SerializeToString()
    back = conv.model_update_from_proto(pb.ModelUpdate.FromString(blob))
    for k in weights:
        scale = meta["tensors"][k]["scale"]
        assert np.abs(np.asarray(back.model_weights[k])
                      - weights[k]).max() <= scale * 0.51 + 1e-6


def test_dp_sgd_engine_mode_with_rdp_accounting():
    """Per-example DP-SGD through the engine: noise applied, ε accounted by
    the moments accountant, overdraw refused."""
    splits = load_dataset("mnist", n_train_synth=128, n_test_synth=32)
    arrays = make_federated_arrays(splits, num_clients=2, strategy="iid",
                                   samples_per_client=32, seed=0)
    model = get_model_for_dataset("mnist")
    # tight budget so exhaustion is reachable in a couple of rounds
    eng = FederatedRoundEngine(
        model, arrays,
        RoundEngineConfig(
            training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
            dp_mode="dp_sgd",
            privacy=PrivacyConfig(epsilon=3.0, delta=1e-5, max_grad_norm=1.0,
                                  noise_multiplier=2.0),
            seed=0, dp_microbatch=4,
        ),
    )
    r1 = eng.run_round(evaluate=False)
    assert np.isfinite(r1.train_loss)
    eps1 = eng.rdp_accountant.get_epsilon(1e-5)
    assert 0 < eps1 <= 3.0
    assert r1.epsilon_spent == pytest.approx(eps1)
    ledger = eng.accountant.get_privacy_ledger()
    assert ledger[0]["mechanism_type"] == "subsampled_gaussian"
    # run until the accountant refuses
    with pytest.raises(PrivacyError):
        for _ in range(50):
            eng.run_round(evaluate=False)
    assert eng.rdp_accountant.get_epsilon(1e-5) <= 3.0 + 1e-6


def test_failure_handler_drives_participation():
    """The failure handler's exclusions flow into the engine's participation
    mask (the reference's continue-with-remaining-clients semantics)."""
    splits = load_dataset("mnist", n_train_synth=256, n_test_synth=32)
    arrays = make_federated_arrays(splits, num_clients=6, strategy="iid",
                                   samples_per_client=16, seed=0)
    eng = FederatedRoundEngine(
        get_model_for_dataset("mnist"), arrays,
        RoundEngineConfig(
            training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
            seed=0,
        ),
    )
    fh = FailureHandler()
    fh.handle_failure("client_2", FailureType.PRIVACY_VIOLATION)
    fh.handle_failure("client_4", FailureType.PROTOCOL_ERROR)
    all_ids = [f"client_{i}" for i in range(6)]
    healthy = fh.get_healthy_clients(all_ids)
    excluded_idx = [i for i, cid in enumerate(all_ids) if cid not in healthy]
    assert excluded_idx == [2, 4]
    mask = eng.sample_participation(exclude=excluded_idx)
    assert mask[2] == 0.0 and mask[4] == 0.0
    r = eng.run_round(mask=mask, evaluate=False)
    assert r.participating_clients == 4
    # after re-admission the client participates again
    fh.include_client("client_4")
    healthy = fh.get_healthy_clients(all_ids)
    assert "client_4" in healthy
