"""Gradient-inversion attack harness (fl_tpu.validation.inversion).

Verifies the empirical privacy evidence: a single-step non-private release
reconstructs the client's image (DLG, Zhu et al. 2019) and leaks its label
(iDLG, Zhao et al. 2020), while the same release through the DP path
collapses the reconstruction to the noise floor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.core import pytree as pt
from fl_tpu.data.synthetic import synthetic_mnist
from fl_tpu.models.factory import ModelFactory
from fl_tpu.validation.inversion import (
    InversionAttackConfig,
    _best_match_mse,
    evaluate_inversion_risk,
    find_classifier_bias_path,
    gradient_from_delta,
    infer_labels,
    inversion_report,
)


@pytest.fixture(scope="module")
def simple_cnn():
    model = ModelFactory.create_model("simple_cnn")
    return model, model.init(jax.random.PRNGKey(0))


def test_gradient_from_delta_inverts_sgd_step():
    g = {"a": jnp.array([1.0, -2.0]), "b": jnp.array([[3.0]])}
    delta = jax.tree.map(lambda x: -0.25 * x, g)
    rec = gradient_from_delta(delta, 0.25)
    assert all(np.allclose(x, y) for x, y in
               zip(jax.tree.leaves(rec), jax.tree.leaves(g)))


def test_find_classifier_bias_path(simple_cnn):
    model, variables = simple_cnn
    path = find_classifier_bias_path(variables, model.num_classes)
    assert path.endswith("fc2/bias")


def test_label_inference_exact_for_batch1(simple_cnn):
    """The fc-bias gradient is softmax − onehot for batch 1: the true
    label is the unique negative coordinate."""
    model, variables = simple_cnn
    from fl_tpu.fl.local_training import cross_entropy_loss

    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (1, 28, 28, 1)), jnp.float32)
    for label in (0, 4, 9):
        y = jnp.asarray([label], jnp.int32)

        def loss_fn(params):
            logits, _ = model.apply(
                {**variables, "params": params}, x, train=False)
            return cross_entropy_loss(logits, y)

        g = jax.grad(loss_fn)(variables["params"])
        bias_g = pt.flatten_dict(g)[
            find_classifier_bias_path(variables, 10)]
        inferred = infer_labels(bias_g, 1)
        assert int(inferred[0]) == label


def test_label_inference_recovers_distinct_pair(simple_cnn):
    model, variables = simple_cnn
    from fl_tpu.fl.local_training import cross_entropy_loss

    x = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, (2, 28, 28, 1)), jnp.float32)
    y = jnp.asarray([2, 7], jnp.int32)

    def loss_fn(params):
        logits, _ = model.apply(
            {**variables, "params": params}, x, train=False)
        return cross_entropy_loss(logits, y)

    g = jax.grad(loss_fn)(variables["params"])
    bias_g = pt.flatten_dict(g)[find_classifier_bias_path(variables, 10)]
    inferred = set(np.asarray(infer_labels(bias_g, 2)).tolist())
    assert inferred == {2, 7}


def test_best_match_mse_handles_permutation():
    a = np.zeros((2, 4, 4, 1))
    b = np.ones((2, 4, 4, 1))
    recon = np.stack([b[0], a[0]])     # swapped order
    truth = np.stack([a[0], b[0]])
    assert _best_match_mse(recon, truth) == pytest.approx(0.0)
    # identity pairing would cost 1.0; the permutation finds 0.0
    assert _best_match_mse(truth, truth) == pytest.approx(0.0)


def test_inversion_report_reconstructs_and_dp_protects(simple_cnn):
    """The headline property: non-private single-step release leaks the
    image (>18 dB PSNR, exact label); the ε=1.0 DP release does not
    (<10 dB, a >8 dB gap). Thresholds are ~12 dB clear of the measured
    values (30.2 vs 3.7 dB at this exact config/seed)."""
    model, variables = simple_cnn
    xtr, ytr, _, _ = synthetic_mnist(n_train=8, n_test=1, seed=3)
    cfg = InversionAttackConfig(steps=1000, restarts=2)
    rep = inversion_report(
        model, variables, xtr[:1], ytr[:1], 0.1307, 0.3081,
        epsilon=1.0, delta=1e-5, max_norm=1.0, attack_config=cfg, seed=0)
    assert rep["non_private"]["psnr_db"] > 18.0
    assert rep["non_private"]["label_accuracy"] == 1.0
    assert rep["dp"]["psnr_db"] < 10.0
    assert rep["psnr_gap_db"] > 8.0
    assert rep["protected"]


def test_evaluate_returns_reconstruction_image(simple_cnn):
    model, variables = simple_cnn
    xtr, ytr, _, _ = synthetic_mnist(n_train=4, n_test=1, seed=5)
    out = evaluate_inversion_risk(
        model, variables, xtr[:1], ytr[:1], 0.1307, 0.3081,
        attack_config=InversionAttackConfig(steps=20, restarts=1), seed=1)
    img = out["reconstruction_u8"]
    assert img.shape == (1, 28, 28, 1) and img.dtype == np.uint8
    assert 0.0 <= out["label_accuracy"] <= 1.0
    assert out["noise_sigma"] == 0.0 and out["dp"] is None
