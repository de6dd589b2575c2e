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


def test_decompress_rejects_hostile_continuation_bytes():
    """A stream stacking 0xFF length-continuation bytes must be rejected,
    not wrap the accumulated length negative and memcpy out of bounds
    (advisor finding r1: signed overflow after ~8.4 MB of 0xFF)."""
    from fl_tpu import native

    if not native.available():
        pytest.skip("native codec unavailable")
    # token declaring extended literal length, then a long run of 0xFF.
    # With the fix the decoder bails as soon as the accumulated length
    # exceeds dst_cap; 1 MB of 0xFF is far past any valid length for a
    # 64-byte declared output.
    payload = bytes([0xF0]) + b"\xff" * (1 << 20) + b"\x00"
    blob = native.MAGIC + (64).to_bytes(4, "little") + payload
    with pytest.raises(ValueError):
        native.lz4_decompress(blob)
    # same attack on the match-length path: valid 4-byte literal, then a
    # match token with extended length and hostile continuation run
    lit = bytes([0x4F]) + b"abcd" + b"\x01\x00" + b"\xff" * (1 << 20) + b"\x00"
    blob2 = native.MAGIC + (64).to_bytes(4, "little") + lit
    with pytest.raises(ValueError):
        native.lz4_decompress(blob2)


def test_decompress_rejects_absurd_declared_size():
    from fl_tpu import native

    if not native.available():
        pytest.skip("native codec unavailable")
    blob = native.MAGIC + (0xFFFFFFFF).to_bytes(4, "little") + b"\x00" * 16
    with pytest.raises(ValueError):
        native.lz4_decompress(blob)


def test_decompress_fuzz_random_payloads():
    """Random and mutated payloads must either roundtrip or raise cleanly —
    never crash (the coordinator decompresses untrusted client bytes)."""
    import random

    from fl_tpu import native

    if not native.available():
        pytest.skip("native codec unavailable")
    rng = random.Random(0)
    data = bytes(rng.randrange(4) for _ in range(4096))  # compressible-ish
    good = native.lz4_compress(data)
    assert native.lz4_decompress(good) == data
    for trial in range(200):
        blob = bytearray(good)
        for _ in range(rng.randrange(1, 8)):
            blob[rng.randrange(8, len(blob))] = rng.randrange(256)
        try:
            native.lz4_decompress(bytes(blob))
        except ValueError:
            pass
    for trial in range(100):
        junk = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 512)))
        blob = native.MAGIC + (256).to_bytes(4, "little") + junk
        try:
            native.lz4_decompress(blob)
        except ValueError:
            pass
