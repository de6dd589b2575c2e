"""Unit tests for the core foundation: pytree weight ops, PRNG discipline,
mesh helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.core import prng
from fl_tpu.core import pytree as pt
from fl_tpu.core.mesh import client_sharding, make_mesh, pad_to_multiple


# --- pytree ops -------------------------------------------------------------

@pytest.fixture
def tree():
    return {
        "a": jnp.asarray([[3.0, 4.0]], jnp.float32),
        "b": {"c": jnp.asarray([12.0], jnp.float32)},
    }


def test_global_norm(tree):
    # sqrt(9 + 16 + 144) = 13
    assert float(pt.global_norm(tree)) == pytest.approx(13.0)


def test_clip_by_global_norm_scales(tree):
    clipped, sens = pt.clip_by_global_norm(tree, 6.5)
    assert float(sens) == pytest.approx(6.5)
    assert float(pt.global_norm(clipped)) == pytest.approx(6.5, rel=1e-5)
    # direction preserved
    ratio = float(clipped["a"][0, 0] / clipped["a"][0, 1])
    assert ratio == pytest.approx(3.0 / 4.0)


def test_clip_below_threshold_is_identity(tree):
    clipped, sens = pt.clip_by_global_norm(tree, 100.0)
    assert float(sens) == pytest.approx(13.0)
    np.testing.assert_allclose(np.asarray(clipped["a"]),
                               np.asarray(tree["a"]))


def test_tree_arithmetic(tree):
    s = pt.tree_add(tree, tree)
    assert float(s["b"]["c"][0]) == 24.0
    d = pt.tree_sub(s, tree)
    assert float(d["b"]["c"][0]) == 12.0
    h = pt.tree_scale(tree, 0.5)
    assert float(h["a"][0, 1]) == 2.0
    assert pt.tree_size(tree) == 3
    assert pt.tree_bytes(tree) == 12


def test_stacked_weighted_mean():
    stacked = {"w": jnp.asarray([[1.0, 1.0], [3.0, 3.0]], jnp.float32)}
    w = jnp.asarray([0.25, 0.75])
    out = pt.stacked_weighted_mean(stacked, w)
    np.testing.assert_allclose(np.asarray(out["w"]), [2.5, 2.5])


def test_flatten_unflatten_dict():
    nested = {"a": {"b": 1, "c": {"d": 2}}, "e": 3}
    flat = pt.flatten_dict(nested)
    assert flat == {"a/b": 1, "a/c/d": 2, "e": 3}
    assert pt.unflatten_dict(flat) == nested


def test_assert_same_structure_raises():
    a = {"x": np.zeros((2, 2))}
    with pytest.raises(ValueError, match="mismatched keys"):
        pt.assert_same_structure(a, {"y": np.zeros((2, 2))})
    with pytest.raises(ValueError, match="Shape mismatch"):
        pt.assert_same_structure(a, {"x": np.zeros((3,))})


# --- PRNG discipline ---------------------------------------------------------

def test_client_round_keys_independent_and_reproducible():
    root = prng.root_key(7)
    k1 = prng.client_round_keys(root, 3, 8)
    k2 = prng.client_round_keys(root, 3, 8)
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(k1)),
                                  np.asarray(jax.random.key_data(k2)))
    # different rounds and different clients give different keys
    k3 = prng.client_round_keys(root, 4, 8)
    assert not np.array_equal(np.asarray(jax.random.key_data(k1)),
                              np.asarray(jax.random.key_data(k3)))
    data = np.asarray(jax.random.key_data(k1))
    assert len({tuple(row) for row in data.reshape(8, -1)}) == 8


def test_stream_keys_distinct():
    ck = prng.client_key(prng.round_key(prng.root_key(0), 1), 2)
    streams = [prng.stream_key(ck, s) for s in prng.Stream]
    data = {tuple(np.asarray(jax.random.key_data(k)).ravel())
            for k in streams}
    assert len(data) == len(list(prng.Stream))


def test_key_reconstruction_without_history():
    """Any (round, client) key is reconstructible from the seed alone —
    the property that makes checkpoint resume exact."""
    root = prng.root_key(42)
    direct = prng.client_key(prng.round_key(root, 57), 13)
    rebuilt = prng.client_key(prng.round_key(prng.root_key(42), 57), 13)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(direct)),
        np.asarray(jax.random.key_data(rebuilt)),
    )


# --- mesh helpers --------------------------------------------------------------

def test_make_mesh_and_sharding(mesh8):
    assert mesh8.devices.size == 8
    assert mesh8.axis_names == ("clients",)
    sh = client_sharding(mesh8)
    x = jnp.zeros((16, 4))
    placed = jax.device_put(x, sh)
    assert len(placed.sharding.device_set) == 8


def test_pad_to_multiple():
    assert pad_to_multiple(7, 8) == 8
    assert pad_to_multiple(8, 8) == 8
    assert pad_to_multiple(9, 8) == 16
