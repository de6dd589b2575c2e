#!/usr/bin/env python
"""Download real MNIST / CIFAR-10 into the fl_tpu data directory.

The library auto-discovers real datasets from ``$FL_TPU_DATA_DIR`` (or
``~/.cache/fl_tpu``, ``/root/data`` — fl_tpu/data/datasets.py) and falls
back to deterministic synthetic data when absent. This script stages the
real files so every accuracy script runs on real data unchanged.

Needs network egress (zero-egress build environments cannot run it — the
point is that a USER with connectivity can re-measure every headline on
real data with two commands):

    python scripts/fetch_datasets.py [--dest DIR] [--dataset mnist|cifar10|all]
    FL_TPU_DATA_DIR=DIR python scripts/dp_sgd_mnist_eps1.py

Mirrors and checksums follow the canonical distributions (LeCun's MNIST
IDX files via the ossci mirror; CIFAR-10 python batches from cs.toronto).
"""

import argparse
import hashlib
import os
import sys
import tarfile
import urllib.request
from pathlib import Path

MNIST_FILES = {
    # filename -> (urls, md5 of the .gz)
    "train-images-idx3-ubyte.gz": (
        ["https://ossci-datasets.s3.amazonaws.com/mnist/train-images-idx3-ubyte.gz",
         "https://storage.googleapis.com/cvdf-datasets/mnist/train-images-idx3-ubyte.gz"],
        "f68b3c2dcbeaaa9fbdd348bbdeb94873"),
    "train-labels-idx1-ubyte.gz": (
        ["https://ossci-datasets.s3.amazonaws.com/mnist/train-labels-idx1-ubyte.gz",
         "https://storage.googleapis.com/cvdf-datasets/mnist/train-labels-idx1-ubyte.gz"],
        "d53e105ee54ea40749a09fcbcd1e9432"),
    "t10k-images-idx3-ubyte.gz": (
        ["https://ossci-datasets.s3.amazonaws.com/mnist/t10k-images-idx3-ubyte.gz",
         "https://storage.googleapis.com/cvdf-datasets/mnist/t10k-images-idx3-ubyte.gz"],
        "9fb629c4189551a2d022fa330f9573f3"),
    "t10k-labels-idx1-ubyte.gz": (
        ["https://ossci-datasets.s3.amazonaws.com/mnist/t10k-labels-idx1-ubyte.gz",
         "https://storage.googleapis.com/cvdf-datasets/mnist/t10k-labels-idx1-ubyte.gz"],
        "ec29112dd5afa0611ce80d1b7f02629c"),
}

CIFAR10_URL = "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz"
CIFAR10_MD5 = "c58f30108f718f92721af3b95e74349a"


def _md5(path: Path) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _download(urls, dest: Path, md5: str) -> bool:
    if dest.exists() and _md5(dest) == md5:
        print(f"  {dest.name}: already present (checksum OK)")
        return True
    for url in urls:
        try:
            print(f"  {dest.name}: downloading from {url.split('/')[2]} ...")
            # socket timeout so a stalled mirror falls through to the next
            # one instead of hanging forever
            with urllib.request.urlopen(url, timeout=60) as r, \
                    open(dest, "wb") as f:
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
            got = _md5(dest)
            if got == md5:
                return True
            print(f"    checksum mismatch ({got}), trying next mirror")
            dest.unlink(missing_ok=True)
        except Exception as e:
            print(f"    failed: {e}")
            dest.unlink(missing_ok=True)
    return False


def fetch_mnist(dest: Path) -> bool:
    dest.mkdir(parents=True, exist_ok=True)
    ok = True
    for name, (urls, md5) in MNIST_FILES.items():
        ok &= _download(urls, dest / name, md5)
    return ok


def fetch_cifar10(dest: Path) -> bool:
    dest.mkdir(parents=True, exist_ok=True)
    tgz = dest / "cifar-10-python.tar.gz"
    if not _download([CIFAR10_URL], tgz, CIFAR10_MD5):
        return False
    print("  extracting cifar-10-batches-py/ ...")
    with tarfile.open(tgz) as tf:
        try:
            tf.extractall(dest, filter="data")
        except TypeError:
            # the `filter` kwarg only exists from 3.10.12/3.11.4/3.12;
            # the archive's checksum was just verified, so plain
            # extraction is acceptable on older interpreters
            tf.extractall(dest)
    return (dest / "cifar-10-batches-py").exists()


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dest",
                   default=os.environ.get("FL_TPU_DATA_DIR",
                                          str(Path.home() / ".cache" / "fl_tpu")))
    p.add_argument("--dataset", default="all",
                   choices=["mnist", "cifar10", "all"])
    args = p.parse_args()
    dest = Path(args.dest)
    print(f"staging datasets into {dest}")

    ok = True
    if args.dataset in ("mnist", "all"):
        print("MNIST:")
        ok &= fetch_mnist(dest)
    if args.dataset in ("cifar10", "all"):
        print("CIFAR-10:")
        ok &= fetch_cifar10(dest)
    if ok:
        print(f"\ndone. Run with FL_TPU_DATA_DIR={dest} (or rely on the "
              "default search path) — loaders pick the real files up "
              "automatically.")
        return 0
    print("\nsome downloads failed — check connectivity/mirrors")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
