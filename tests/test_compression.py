"""Compression + serialization tests (ref smoke checks:
quick_start.py:92-122 roundtrip, test_complete_system.py:220-268 fidelity)."""

import numpy as np
import pytest

from fl_tpu.core.types import GlobalModel, ModelUpdate
from fl_tpu.fl.compression import (
    CompressionError,
    benchmark_compression_algorithms,
    create_compression_service,
)
from fl_tpu.services.serialization import (
    GlobalModelSerializer,
    ModelUpdateSerializer,
    ModelWeightSerializer,
    validate_serialization_roundtrip,
)


@pytest.fixture
def weights():
    rng = np.random.default_rng(0)
    return {
        "conv1/kernel": rng.normal(0, 0.1, (3, 3, 1, 8)).astype(np.float32),
        "conv1/bias": np.zeros(8, np.float32),
        "fc/kernel": rng.normal(0, 0.05, (64, 10)).astype(np.float32),
    }


def test_zlib_lossless_roundtrip(weights):
    svc = create_compression_service("zlib")
    payload, meta = svc.compress_weights(weights)
    assert meta["compression_ratio"] > 0
    restored = svc.decompress_weights(payload, meta)
    for k in weights:
        np.testing.assert_array_equal(weights[k], restored[k])


def test_lz4_alias(weights):
    svc = create_compression_service("lz4")
    payload, meta = svc.compress_weights(weights)
    restored = svc.decompress_weights(payload, meta)
    np.testing.assert_array_equal(weights["fc/kernel"], restored["fc/kernel"])


@pytest.mark.parametrize("bits", [8, 4, 16])
def test_quantization_fidelity(weights, bits):
    svc = create_compression_service("quantization", bits=bits)
    payload, meta = svc.compress_weights(weights)
    restored = svc.decompress_weights(payload, meta)
    for k in weights:
        scale = meta["tensors"][k]["scale"]
        err = np.abs(weights[k] - restored[k]).max()
        assert err <= scale * 0.51 + 1e-7
        assert restored[k].shape == weights[k].shape
        assert restored[k].dtype == weights[k].dtype


def test_topk_keeps_largest(weights):
    svc = create_compression_service("top_k", sparsity_ratio=0.9)
    payload, meta = svc.compress_weights(weights)
    restored = svc.decompress_weights(payload, meta)
    w = weights["fc/kernel"].ravel()
    r = restored["fc/kernel"].ravel()
    kept = np.flatnonzero(r)
    assert len(kept) == max(1, int(round(len(w) * 0.1)))
    np.testing.assert_allclose(r[kept], w[kept], rtol=1e-6)
    # the largest element survived
    assert r[np.argmax(np.abs(w))] != 0


def test_cross_service_decompress(weights):
    """A service created with one algorithm decompresses packages from
    another (self-describing metadata — ref compression.py:416-440)."""
    qsvc = create_compression_service("quantization")
    payload, meta = qsvc.compress_weights(weights)
    zsvc = create_compression_service("zlib")
    restored = zsvc.decompress_weights(payload, meta)
    assert set(restored) == set(weights)


def test_unknown_algorithm_raises():
    with pytest.raises(CompressionError):
        create_compression_service("middle_out")


def test_benchmark_runs():
    res = benchmark_compression_algorithms()
    assert res["zlib"]["lossless"]
    assert res["quantization"]["compression_ratio"] < 0.5
    assert res["top_k"]["compression_ratio"] < 0.5


# --- serialization -------------------------------------------------------------

def test_npz_roundtrip(weights):
    assert validate_serialization_roundtrip(weights, "npz")


def test_torch_interop_roundtrip(weights):
    """Byte compatibility with the reference wire format: torch.save bytes
    in, torch.save bytes out (ref serialization.py:27-79)."""
    torch = pytest.importorskip("torch")
    ser = ModelWeightSerializer("torch")
    data = ser.serialize_weights(weights)
    # the payload is loadable by plain torch.load, like a reference peer would
    import io

    loaded = torch.load(io.BytesIO(data), weights_only=True)
    assert set(loaded) == set(weights)
    # and the deserializer accepts torch-produced bytes
    buf = io.BytesIO()
    torch.save({k: torch.from_numpy(v.copy()) for k, v in weights.items()}, buf)
    restored = ser.deserialize_weights(buf.getvalue())
    for k in weights:
        np.testing.assert_array_equal(weights[k], restored[k])


def test_hex_quirk(weights):
    ser = ModelWeightSerializer("npz")
    hx = ser.serialize_weights_hex(weights)
    assert all(c in "0123456789abcdef" for c in hx)
    restored = ser.deserialize_weights_hex(hx)
    np.testing.assert_array_equal(weights["fc/kernel"], restored["fc/kernel"])


def test_model_update_envelope(weights):
    ser = ModelUpdateSerializer()
    update = ModelUpdate(
        client_id="c1", round_number=3, model_weights=weights,
        num_samples=100, training_loss=0.5, privacy_budget_used=0.1,
        compression_ratio=0.8,
    )
    env = ser.serialize_model_update(update)
    back = ser.deserialize_model_update(env)
    assert back.client_id == "c1" and back.round_number == 3
    assert back.num_samples == 100
    np.testing.assert_array_equal(back.model_weights["fc/kernel"],
                                  weights["fc/kernel"])


def test_global_model_envelope(weights):
    ser = GlobalModelSerializer()
    gm = GlobalModel(
        round_number=7, model_weights=weights,
        accuracy_metrics={"test_accuracy": 0.91},
        participating_clients=["a", "b"], convergence_score=0.01,
    )
    back = ser.deserialize_global_model(ser.serialize_global_model(gm))
    assert back.round_number == 7
    assert back.get_accuracy() == pytest.approx(0.91)
    assert back.participating_clients == ["a", "b"]
