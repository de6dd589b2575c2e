#!/usr/bin/env python
"""Complete-system smoke test: nine checks.

Parity target: scripts/test_complete_system.py (:24-359) — extends
quick_start with data-loader statistics, compression fidelity
(allclose), proto message construction, privacy validation, and
performance validation.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.quick_start import (  # noqa: E402
    FAIL,
    PASS,
    check,
    test_compression_roundtrip,
    test_imports,
    test_model_creation,
    test_privacy_noise,
    test_three_client_fedavg,
)


def test_data_loader_statistics():
    from fl_tpu.data import create_data_loader

    loader = create_data_loader("mnist", num_clients=4,
                                partition_strategy="non_iid",
                                n_train_synth=1024, n_test_synth=128)
    stats = loader.get_client_statistics()
    assert len(stats) == 4
    assert sum(s["num_samples"] for s in stats.values()) == 1024
    analysis = loader.analyze_distribution()
    assert analysis["mean_pairwise_tv_distance"] > 0


def test_quantization_fidelity():
    import numpy as np

    from fl_tpu.fl.compression import create_compression_service

    svc = create_compression_service("quantization", bits=8)
    weights = {"w": np.random.default_rng(1).normal(
        size=(256,)).astype(np.float32)}
    payload, meta = svc.compress_weights(weights)
    restored = svc.decompress_weights(payload, meta)
    assert np.allclose(weights["w"], restored["w"],
                       atol=meta["tensors"]["w"]["scale"])


def test_proto_messages():
    from fl_tpu.services import federated_learning_pb2 as pb

    update = pb.ModelUpdate(client_id="c1", round_number=2,
                            model_weights=b"\x00\x01", num_samples=10,
                            training_loss=0.5)
    blob = update.SerializeToString()
    back = pb.ModelUpdate.FromString(blob)
    assert back.client_id == "c1" and back.num_samples == 10
    status = pb.TrainingStatus(current_round=3, active_clients=5)
    assert pb.TrainingStatus.FromString(
        status.SerializeToString()).current_round == 3


def test_privacy_validation():
    from fl_tpu.validation import PrivacyValidator

    v = PrivacyValidator()
    assert v.validate_privacy_budget_tracking()["passed"]
    assert v.validate_differential_privacy(dim=4096, trials=2,
                                           use_pallas=False)["passed"]


def test_performance_validation():
    from fl_tpu.validation import (
        PerformanceRequirements,
        PerformanceValidator,
    )

    v = PerformanceValidator(samples_per_client=16, local_epochs=1,
                             batch_size=8,
                             requirements=PerformanceRequirements(
                                 max_latency_ms=120_000))
    assert v.run_baseline_test(num_clients=2)["passed"]


def test_robust_aggregation():
    import jax.numpy as jnp
    import numpy as np

    from fl_tpu.fl.robust_agg import median_matrix, trimmed_mean_matrix

    mat = jnp.asarray([[1.0], [2.0], [3.0], [1e6]], jnp.float32)
    mask = jnp.ones(4, jnp.float32)
    assert float(trimmed_mean_matrix(mat, mask, 1)[0]) == 2.5
    assert float(median_matrix(mat, mask)[0]) == 2.5
    assert np.isfinite(float(median_matrix(mat, mask)[0]))


def test_secure_aggregation_cancellation():
    import jax
    import numpy as np

    from fl_tpu.fl.secure_agg import ring_pair_masks

    m = ring_pair_masks(jax.random.PRNGKey(0), 8, 130, neighbors=3,
                        scale=4.0)
    assert abs(float(np.asarray(m.sum(axis=0)).max())) < 1e-3
    assert float(np.abs(np.asarray(m)).max()) > 1.0


def test_server_optimizer_identity():
    import jax.numpy as jnp
    import numpy as np

    from fl_tpu.fl.server_optimizer import (
        make_server_optimizer,
        make_server_update_fn,
    )

    opt = make_server_optimizer("fedavgm", learning_rate=1.0, momentum=0.0)
    upd = make_server_update_fn(opt)
    params = {"w": jnp.asarray([1.0, 2.0])}
    avg = {"w": jnp.asarray([0.5, 1.5])}
    new, _ = upd(params, avg, opt.init(params))
    np.testing.assert_allclose(np.asarray(new["w"]), np.asarray(avg["w"]),
                               rtol=1e-6)


def main() -> int:
    print("fl_tpu complete-system checks:")
    results = [
        check("imports", test_imports),
        check("model creation", test_model_creation),
        check("differential privacy noise", test_privacy_noise),
        check("compression roundtrip", test_compression_roundtrip),
        check("3-client FedAvg", test_three_client_fedavg),
        check("data loader statistics", test_data_loader_statistics),
        check("quantization fidelity", test_quantization_fidelity),
        check("proto message construction", test_proto_messages),
        check("privacy validation", test_privacy_validation),
        check("performance validation", test_performance_validation),
        check("robust aggregation", test_robust_aggregation),
        check("secure aggregation mask cancellation",
              test_secure_aggregation_cancellation),
        check("server optimizer identity", test_server_optimizer_identity),
    ]
    print(f"\n{sum(results)}/{len(results)} checks passed")
    return 0 if all(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
