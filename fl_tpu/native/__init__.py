"""First-party native (C++) runtime components, bound via ctypes.

Currently: the LZ4-block codec (fl_codec.cpp) serving the compression
service's ``lz4`` algorithm — the slot the reference fills with the
third-party lz4 wheel (src/shared/compression.py:62-122). The shared
library is built with g++ on first use and cached next to the source;
environments without a toolchain fall back to zlib transparently
(fl_tpu.fl.compression handles the dispatch).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "fl_codec.cpp"
_LIB = _HERE / "libflcodec.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

MAGIC = b"FLZ4"


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logger.warning("native codec build failed (%s); zlib fallback in use",
                       e)
        return False


def load_codec() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native codec; None when unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError as e:
            logger.warning("native codec load failed: %s", e)
            _build_failed = True
            return None
        lib.fl_lz4_bound.restype = ctypes.c_int
        lib.fl_lz4_bound.argtypes = [ctypes.c_int]
        lib.fl_lz4_compress.restype = ctypes.c_int
        lib.fl_lz4_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.fl_lz4_decompress.restype = ctypes.c_int
        lib.fl_lz4_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load_codec() is not None


def lz4_compress(data: bytes) -> bytes:
    """Compress to [MAGIC][u32 original size][lz4 block]."""
    lib = load_codec()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    bound = lib.fl_lz4_bound(len(data))
    out = (ctypes.c_uint8 * bound)()
    n = lib.fl_lz4_compress(data, len(data), out, bound)
    if n < 0:
        raise RuntimeError("lz4 compression failed")
    return MAGIC + len(data).to_bytes(4, "little") + bytes(out[:n])


def lz4_decompress(blob: bytes) -> bytes:
    lib = load_codec()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    if blob[:4] != MAGIC:
        raise ValueError("not an fl_tpu lz4 payload")
    orig = int.from_bytes(blob[4:8], "little")
    # the header is untrusted: LZ4's maximum ratio is ~255×, so a declared
    # size beyond that is malformed (and would otherwise be a memory-DoS)
    if orig > 255 * max(len(blob) - 8, 1) + 64:
        raise ValueError("declared decompressed size exceeds LZ4 bound")
    out = (ctypes.c_uint8 * orig)()
    n = lib.fl_lz4_decompress(blob[8:], len(blob) - 8, out, orig)
    if n != orig:
        raise ValueError(f"lz4 decompression failed ({n} != {orig})")
    return bytes(out)
