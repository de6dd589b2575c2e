"""Kernel-level numerics tests (SURVEY.md §4: unit tests per kernel vs
numpy references). Pallas kernels run in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.ops import dp as dp_ops
from fl_tpu.ops import quantize as q_ops
from fl_tpu.ops import topk as topk_ops
from fl_tpu.ops.flatten import stack_flatten, stack_unflatten
from fl_tpu.ops.preprocess import (
    make_cifar_augment,
    normalize_u8,
    random_hflip,
)


# --- flatten ---------------------------------------------------------------

def test_stack_flatten_roundtrip():
    tree = {
        "a": jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4),
        "b": {"c": jnp.ones((2, 7), jnp.bfloat16)},
    }
    mat, spec = stack_flatten(tree)
    assert mat.shape[0] == 2 and mat.shape[1] % 128 == 0
    back = stack_unflatten(mat, spec)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(
        np.asarray(back["b"]["c"], np.float32),
        np.asarray(tree["b"]["c"], np.float32),
    )


# --- DP clip+noise -----------------------------------------------------------

def _mk_matrix(c=4, d=dp_ops.CHUNK, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, scale, size=(c, d)), jnp.float32)


def test_clip_noise_jnp_clips_norm():
    x = _mk_matrix(scale=5.0)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    noisy, sens, sigma = dp_ops.clip_noise_matrix(
        x, keys, epsilon=1e9, delta=1e-5, max_norm=1.0, use_pallas=False
    )
    # with epsilon huge, sigma ~ 0: output is just the clipped matrix
    np.testing.assert_allclose(np.asarray(sens), 1.0, rtol=1e-5)
    norms = np.linalg.norm(np.asarray(noisy), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-3)


def test_clip_noise_sigma_formula():
    """σ must equal min(‖x‖, C)·√(2·ln(1.25/δ))/ε (ref privacy.py:209)."""
    x = _mk_matrix(c=2, scale=0.001)  # small norm: sensitivity = actual norm
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    eps, delta = 1.0, 1e-5
    _, sens, sigma = dp_ops.clip_noise_matrix(
        x, keys, eps, delta, max_norm=1.0, use_pallas=False
    )
    expected = np.asarray(sens) * np.sqrt(2 * np.log(1.25 / delta)) / eps
    np.testing.assert_allclose(np.asarray(sigma), expected, rtol=1e-5)


def test_clip_noise_statistics_jnp():
    """Observed noise std within [0.5σ, 2σ] — the reference's own
    statistical validation bound (privacy_validator.py:104-108)."""
    x = jnp.zeros((2, dp_ops.CHUNK * 4), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(2), 2)
    noisy, _, sigma = dp_ops.clip_noise_matrix(
        x, keys, epsilon=1.0, delta=1e-5, max_norm=1.0, use_pallas=False
    )
    # x = 0 -> sensitivity 0 -> sigma 0; instead use x tiny but nonzero
    x = jnp.full((2, dp_ops.CHUNK * 4), 1e-4, jnp.float32)
    noisy, _, sigma = dp_ops.clip_noise_matrix(
        x, keys, epsilon=1.0, delta=1e-5, max_norm=1.0, use_pallas=False
    )
    observed = np.std(np.asarray(noisy - x), axis=1)
    ratio = observed / np.asarray(sigma)
    assert np.all(ratio > 0.5) and np.all(ratio < 2.0)


def test_clip_noise_pallas_interpret_mechanics():
    """Interpret-mode check of the kernel's data plumbing: the TPU
    interpreter stubs prng_random_bits to zeros, which makes the Box–Muller
    output the deterministic constant z0 = √(−2·ln(2⁻²⁵)); the kernel output
    must then be exactly x·clip_scale + σ·z0 per client — validating block
    indexing, per-client scale/σ routing, and the clip math. The noise
    *distribution* is validated on real TPU by
    test_clip_noise_pallas_tpu_statistics and in jnp by
    test_clip_noise_statistics_jnp."""
    c, d = 3, dp_ops.CHUNK * 2
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 2.0, size=(c, d)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(3), c)
    noisy, sens, sigma = dp_ops.clip_noise_matrix(
        x, keys, epsilon=1.0, delta=1e-5, max_norm=1.0,
        use_pallas=True, interpret=True,
    )
    assert np.asarray(sens).max() <= 1.0 + 1e-5
    norms = np.linalg.norm(np.asarray(x), axis=1, keepdims=True)
    scale = np.minimum(1.0, 1.0 / norms)
    z0 = np.sqrt(-2.0 * np.log(2.0 ** -25))  # stubbed-PRNG constant
    expected = np.asarray(x) * scale + np.asarray(sigma)[:, None] * z0
    np.testing.assert_allclose(np.asarray(noisy), expected, rtol=1e-4)


@pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="real-TPU PRNG required (interpret mode stubs random bits)",
)
def test_clip_noise_pallas_tpu_statistics():
    """On real TPU: kernel noise must match N(0, σ²) within the reference's
    statistical bound [0.5σ, 2σ] and client rows must be independent."""
    c, d = 4, dp_ops.CHUNK * 2
    x = jnp.full((c, d), 1e-3, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(4), c)
    noisy, _, sigma = dp_ops.clip_noise_matrix(
        x, keys, 1.0, 1e-5, 1.0, use_pallas=True
    )
    residual = np.asarray(noisy) - np.asarray(x)
    ratio = residual.std(axis=1) / np.asarray(sigma)
    assert np.all(ratio > 0.5) and np.all(ratio < 2.0), ratio
    rows = np.asarray(noisy)
    for i in range(c):
        for j in range(i + 1, c):
            assert not np.allclose(rows[i], rows[j])


# --- quantization -------------------------------------------------------------

@pytest.mark.parametrize("bits,symmetric", [(8, False), (8, True), (4, False),
                                            (2, True), (16, False)])
def test_quantize_affine_roundtrip(bits, symmetric):
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, size=(1000,)), jnp.float32)
    q, scale, zp = q_ops.quantize_affine(x, bits, symmetric)
    back = q_ops.dequantize_affine(q, scale, zp, symmetric)
    err = np.abs(np.asarray(back - x))
    # quantization step bound
    step = float(scale)
    assert err.max() <= step * 0.51 + 1e-6


def test_quantize_int8_blocks_interpret():
    d = q_ops.CHUNK * 2
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(0, 3, size=(d,)), jnp.float32)
    q, scales = q_ops.quantize_int8(x, seed=jnp.int32(7), use_pallas=True,
                                    interpret=True)
    assert q.dtype == jnp.int8 and scales.shape == (2,)
    back = q_ops.dequantize_int8_blocks(q, scales)
    err = np.abs(np.asarray(back) - np.asarray(x))
    # interpret mode rounds to nearest: half-step bound
    assert err.max() <= float(scales.max()) * 0.51


def test_quantize_int8_jnp_path():
    d = q_ops.CHUNK
    x = jnp.linspace(-1, 1, d, dtype=jnp.float32)
    q, scales = q_ops.quantize_int8(x, use_pallas=False)
    back = q_ops.dequantize_int8_blocks(q, scales)
    assert np.abs(np.asarray(back) - np.asarray(x)).max() <= float(scales.max())


# --- top-k ---------------------------------------------------------------------

def test_topk_sparsify_roundtrip():
    x = jnp.asarray([0.1, -5.0, 0.01, 3.0, -0.2, 0.0], jnp.float32)
    vals, idx = topk_ops.topk_sparsify(x, 2)
    assert set(np.asarray(idx).tolist()) == {1, 3}
    dense = topk_ops.topk_densify(vals, idx, 6)
    np.testing.assert_allclose(np.asarray(dense),
                               [0, -5.0, 0, 3.0, 0, 0], rtol=1e-6)


def test_topk_ratio():
    x = jnp.arange(100, dtype=jnp.float32)
    vals, idx = topk_ops.topk_sparsify_ratio(x, 0.9)
    assert len(np.asarray(vals)) == 10
    assert np.asarray(vals).min() == 90


# --- preprocess ------------------------------------------------------------------

def test_normalize_u8():
    x = jnp.full((2, 4, 4, 1), 255, jnp.uint8)
    out = normalize_u8(x, (0.5,), (0.25,))
    np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-6)


def test_hflip_flips_some():
    key = jax.random.PRNGKey(0)
    x = jnp.arange(2 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 4, 1)
    out = random_hflip(x, key)
    # deterministic per key; either flipped or not, shape preserved
    assert out.shape == x.shape
    outs = [np.asarray(random_hflip(x, jax.random.PRNGKey(s))) for s in range(8)]
    assert any(not np.allclose(o, np.asarray(x)) for o in outs)


def test_cifar_augment_shape_and_variety():
    aug = make_cifar_augment()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    a = aug(x, jax.random.PRNGKey(2))
    b = aug(x, jax.random.PRNGKey(3))
    assert a.shape == x.shape
    assert not np.allclose(np.asarray(a), np.asarray(b))
