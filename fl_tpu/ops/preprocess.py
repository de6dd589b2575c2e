"""On-device input preprocessing: normalize + augmentation.

Parity target: the torchvision transform pipelines in the reference
(src/shared/data_loader.py:296-306 MNIST normalize; :452-464 CIFAR random
crop with 4-px padding + horizontal flip + normalize). The reference runs
these per-sample on the host inside DataLoader workers; here they are
batched jnp ops executed on-device inside the training step (XLA fuses them
into the input pipeline of the first conv), so the HBM-resident shards stay
uint8 and augmentation costs no host round trips.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def normalize_u8(x_u8: jax.Array, mean, std) -> jax.Array:
    """uint8 NHWC -> normalized float32."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x_u8.astype(jnp.float32) / 255.0 - mean) / std


def random_crop_with_padding(
    x: jax.Array, key: jax.Array, padding: int = 4
) -> jax.Array:
    """Batched random crop after reflection-free zero padding
    (ref: transforms.RandomCrop(32, padding=4), data_loader.py:455).

    One (dy, dx) offset per batch — the standard TPU-friendly batched-augment
    compromise (a per-sample offset would force per-sample dynamic slices;
    per-batch keeps it one fused slice). Different batches/steps get
    different offsets via the per-step key.
    """
    b, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    kdy, kdx = jax.random.split(key)
    dy = jax.random.randint(kdy, (), 0, 2 * padding + 1)
    dx = jax.random.randint(kdx, (), 0, 2 * padding + 1)
    return jax.lax.dynamic_slice(padded, (0, dy, dx, 0), (b, h, w, c))


def random_hflip(x: jax.Array, key: jax.Array) -> jax.Array:
    """Per-sample random horizontal flip
    (ref: transforms.RandomHorizontalFlip, data_loader.py:456)."""
    b = x.shape[0]
    flip = jax.random.bernoulli(key, 0.5, (b, 1, 1, 1))
    return jnp.where(flip, x[:, :, ::-1, :], x)


def make_cifar_augment(padding: int = 4) -> Callable:
    """Augment function pluggable into make_local_train_fn: random crop
    (4-px pad) + random horizontal flip, applied to the already-normalized
    batch exactly like the reference's train-transform order."""

    def augment(x: jax.Array, key: jax.Array) -> jax.Array:
        kc, kf = jax.random.split(key)
        x = random_crop_with_padding(x, kc, padding)
        return random_hflip(x, kf)

    return augment
