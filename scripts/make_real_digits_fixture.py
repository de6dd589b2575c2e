"""Build the checked-in REAL-handwriting IDX fixture.

Zero-egress environments cannot stage true MNIST (scripts/fetch_datasets.py
is the full-data path), but scikit-learn bundles the UCI "Optical
Recognition of Handwritten Digits" set offline: 1,797 REAL handwritten
digit images (43 writers, NIST preprocessing) at 8x8/17 levels. This script
converts them into MNIST-format IDX files (28x28 uint8, nearest-neighbor
upsample, 0..255 intensity) under tests/fixtures/real_digits/ so the
framework's ACTUAL IDX decode -> normalize -> partition -> train path runs
on non-synthetic bytes in CI (reference analog: the torchvision MNIST
download in src/shared/data_loader.py:267-300).

Run once; the ~300 KB gzipped output is committed.
"""

from __future__ import annotations

import gzip
import struct
from pathlib import Path

import numpy as np

OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / \
    "real_digits"
TRAIN_FRACTION = 0.85
SEED = 0


def _to_mnist_format(images8: np.ndarray) -> np.ndarray:
    """(N, 8, 8) float 0..16 -> (N, 28, 28) uint8 0..255 nearest-neighbor."""
    idx = (np.arange(28) * 8) // 28
    up = images8[:, idx][:, :, idx]
    return np.clip(np.round(up * (255.0 / 16.0)), 0, 255).astype(np.uint8)


def _write_idx_images(path: Path, images: np.ndarray) -> None:
    n, h, w = images.shape
    with gzip.open(path, "wb") as f:
        f.write(struct.pack(">IIII", 0x00000803, n, h, w))
        f.write(images.tobytes())


def _write_idx_labels(path: Path, labels: np.ndarray) -> None:
    with gzip.open(path, "wb") as f:
        f.write(struct.pack(">II", 0x00000801, len(labels)))
        f.write(labels.astype(np.uint8).tobytes())


def main() -> None:
    from sklearn.datasets import load_digits

    d = load_digits()
    images = _to_mnist_format(d.images)
    labels = d.target.astype(np.uint8)

    rng = np.random.default_rng(SEED)
    order = rng.permutation(len(images))
    n_train = int(len(images) * TRAIN_FRACTION)
    tr, te = order[:n_train], order[n_train:]

    OUT.mkdir(parents=True, exist_ok=True)
    _write_idx_images(OUT / "train-images-idx3-ubyte.gz", images[tr])
    _write_idx_labels(OUT / "train-labels-idx1-ubyte.gz", labels[tr])
    _write_idx_images(OUT / "t10k-images-idx3-ubyte.gz", images[te])
    _write_idx_labels(OUT / "t10k-labels-idx1-ubyte.gz", labels[te])
    print(f"wrote {n_train} train / {len(te)} test real digit images "
          f"to {OUT}")
    for p in sorted(OUT.iterdir()):
        print(f"  {p.name}: {p.stat().st_size} bytes")


if __name__ == "__main__":
    main()
