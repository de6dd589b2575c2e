"""Native LZ4-block codec tests (C++ via ctypes) + its compression-service
integration."""

import numpy as np
import pytest

from fl_tpu import native
from fl_tpu.fl.compression import create_compression_service

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for the native codec"
)


@pytest.mark.parametrize("case", [
    b"",
    b"a",
    b"abcd" * 10_000,
    bytes(100_000),
    np.random.default_rng(0).normal(size=25_000).astype(np.float32).tobytes(),
    np.random.default_rng(1).integers(-5, 5, 200_000).astype(np.int8).tobytes(),
    bytes(range(256)) * 300,
])
def test_lz4_roundtrip(case):
    comp = native.lz4_compress(case)
    assert comp[:4] == native.MAGIC
    assert native.lz4_decompress(comp) == case


def test_lz4_compresses_redundancy():
    data = b"federated learning on tpus " * 5000
    comp = native.lz4_compress(data)
    assert len(comp) < len(data) // 10


def test_lz4_rejects_garbage():
    with pytest.raises(ValueError):
        native.lz4_decompress(b"NOPE" + bytes(20))
    # corrupted body: flip bytes after a valid header
    good = native.lz4_compress(b"hello world, hello world, hello world!")
    bad = bytearray(good)
    if len(bad) > 12:
        bad[10] ^= 0xFF
        bad[11] ^= 0xFF
        try:
            out = native.lz4_decompress(bytes(bad))
            # a flip may still decode; it must never crash or over-run
            assert isinstance(out, bytes)
        except ValueError:
            pass


def test_lz4_service_roundtrip():
    svc = create_compression_service("lz4")
    rng = np.random.default_rng(2)
    weights = {
        "conv/kernel": rng.normal(0, 0.1, (3, 3, 8, 8)).astype(np.float32),
        "sparse": np.zeros((4096,), np.float32),
    }
    payload, meta = svc.compress_weights(weights)
    assert meta["algorithm"] == "lz4"
    assert meta["backend"] == "native"
    restored = svc.decompress_weights(payload, meta)
    for k in weights:
        np.testing.assert_array_equal(weights[k], restored[k])
