"""Model zoo tests: shapes, parameter counts, factory routing, weight-dict
round trips. Mirrors the reference smoke checks (scripts/quick_start.py:43-63,
scripts/test_complete_system.py model section) but as a real pytest suite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu import models as M


@pytest.mark.parametrize("name", list(M.AVAILABLE_MODELS))
def test_forward_shapes(name):
    model = M.create_model(name, num_classes=10)
    variables = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((4,) + model.input_shape, jnp.float32)
    logits, _ = model.apply(variables, x, train=False)
    assert logits.shape == (4, 10)
    assert jnp.all(jnp.isfinite(logits))


def test_simple_cnn_param_count():
    """SimpleCNN has the reference architecture's exact parameter count:
    conv1 (3*3*1*32 + 32) + conv2 (3*3*32*64 + 64) + fc1 (3136*128 + 128)
    + fc2 (128*10 + 10) = 421,642."""
    model = M.create_model("simple_cnn")
    variables = model.init(jax.random.PRNGKey(0))
    assert model.get_parameter_count(variables) == 421_642


def test_train_mode_updates_batch_stats():
    model = M.create_model("cifar10_cnn")
    variables = model.init(jax.random.PRNGKey(0))
    assert "batch_stats" in variables
    x = jax.random.normal(jax.random.PRNGKey(1), (8,) + model.input_shape)
    _, new_vars = model.apply(
        variables, x, train=True, dropout_rng=jax.random.PRNGKey(2)
    )
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(new_vars["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_dropout_only_in_train_mode():
    model = M.create_model("simple_cnn")
    variables = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4,) + model.input_shape)
    a, _ = model.apply(variables, x, train=False)
    b, _ = model.apply(variables, x, train=False)
    np.testing.assert_allclose(a, b)
    c, _ = model.apply(variables, x, train=True, dropout_rng=jax.random.PRNGKey(2))
    d, _ = model.apply(variables, x, train=True, dropout_rng=jax.random.PRNGKey(3))
    assert not np.allclose(c, d)


def test_factory_dataset_routing():
    assert M.get_model_for_dataset("mnist").name == "simple_cnn"
    assert M.get_model_for_dataset("cifar10").name == "cifar10_cnn"
    resnet = M.get_model_for_dataset("cifar100")
    assert resnet.name == "federated_resnet"
    assert resnet.num_classes == 100
    assert M.get_model_for_dataset("unknown_ds").name == "simple_cnn"


def test_factory_unknown_model_raises():
    with pytest.raises(ValueError, match="Unknown model"):
        M.create_model("nope")


def test_weight_dict_roundtrip():
    model = M.create_model("simple_cnn")
    variables = model.init(jax.random.PRNGKey(0))
    weights = model.get_model_weights(variables)
    assert all("/" in k for k in weights)
    rebuilt = model.set_model_weights(variables, weights)
    x = jnp.ones((2,) + model.input_shape)
    a, _ = model.apply(variables, x, train=False)
    b, _ = model.apply(rebuilt, x, train=False)
    np.testing.assert_allclose(a, b)


def test_set_weights_structure_mismatch_raises():
    model = M.create_model("simple_cnn")
    variables = model.init(jax.random.PRNGKey(0))
    weights = model.get_model_weights(variables)
    weights.pop(next(iter(weights)))
    with pytest.raises(ValueError):
        model.set_model_weights(variables, weights)


def test_model_compatibility():
    a = M.create_model("simple_cnn")
    b = M.create_model("simple_cnn")
    c = M.create_model("cifar10_cnn")
    assert M.validate_model_compatibility(a, b)
    assert not M.validate_model_compatibility(a, c)


def test_mobilenet_width_multiplier():
    small = M.get_lightweight_model()
    full = M.create_model("lightweight_mobilenet")
    vs = small.init(jax.random.PRNGKey(0))
    vf = full.init(jax.random.PRNGKey(0))
    assert small.get_parameter_count(vs) < full.get_parameter_count(vf)
