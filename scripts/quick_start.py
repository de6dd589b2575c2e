#!/usr/bin/env python
"""Quick-start smoke test: five checks in under a minute.

Parity target: scripts/quick_start.py — (1) imports (:20), (2) model
creation (:43), (3) DP noise actually applied (:65), (4) compression
roundtrip (:92), (5) 3-client FedAvg on dummy weights (:123).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PASS = "✓"
FAIL = "✗"


def check(name, fn):
    try:
        fn()
        print(f"  {PASS} {name}")
        return True
    except Exception as e:
        print(f"  {FAIL} {name}: {e}")
        return False


def test_imports():
    import fl_tpu  # noqa: F401
    import fl_tpu.fl.fedavg  # noqa: F401
    import fl_tpu.fl.privacy  # noqa: F401
    import fl_tpu.models  # noqa: F401
    import fl_tpu.orchestration  # noqa: F401


def test_model_creation():
    import jax

    from fl_tpu.models import create_model, list_available_models

    assert len(list_available_models()) == 4
    model = create_model("simple_cnn")
    variables = model.init(jax.random.PRNGKey(0))
    assert model.get_parameter_count(variables) == 421_642


def test_privacy_noise():
    import jax.numpy as jnp
    import numpy as np

    from fl_tpu.fl.privacy import create_privacy_engine

    engine = create_privacy_engine(epsilon=1.0, delta=1e-5)
    grads = {"w": jnp.full((512,), 0.001, jnp.float32)}
    noisy = engine.add_noise(grads, 1.0, 1e-5)
    assert not np.allclose(np.asarray(noisy["w"]), 0.001), "noise not applied"
    assert engine.budget_tracker.consumed_epsilon == 1.0


def test_compression_roundtrip():
    import numpy as np

    from fl_tpu.fl.compression import create_compression_service

    svc = create_compression_service("zlib")
    weights = {"w": np.random.default_rng(0).normal(
        size=(64, 32)).astype(np.float32)}
    payload, meta = svc.compress_weights(weights)
    restored = svc.decompress_weights(payload, meta)
    np.testing.assert_array_equal(weights["w"], restored["w"])


def test_three_client_fedavg():
    import numpy as np

    from fl_tpu.core.types import ModelUpdate
    from fl_tpu.fl.fedavg import FedAvgAggregator

    updates = [
        ModelUpdate(client_id=f"c{i}", round_number=0,
                    model_weights={"w": np.full((16,), float(i), np.float32)},
                    num_samples=100 * (i + 1), training_loss=0.5)
        for i in range(3)
    ]
    model = FedAvgAggregator().aggregate_updates(updates)
    # weighted mean: (100*0 + 200*1 + 300*2)/600 = 4/3
    np.testing.assert_allclose(np.asarray(model.model_weights["w"]),
                               4.0 / 3.0, rtol=1e-6)


def main() -> int:
    print("fl_tpu quick start checks:")
    results = [
        check("imports", test_imports),
        check("model creation", test_model_creation),
        check("differential privacy noise", test_privacy_noise),
        check("compression roundtrip", test_compression_roundtrip),
        check("3-client FedAvg", test_three_client_fedavg),
    ]
    print(f"\n{sum(results)}/{len(results)} checks passed")
    return 0 if all(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
