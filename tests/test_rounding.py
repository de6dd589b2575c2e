"""Stochastic f32->bf16 rounding (fl_tpu.ops.rounding) and the
`param_storage_dtype="bfloat16"` local-training path it backs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.ops.rounding import stochastic_round_bf16, stochastic_round_tree_bf16


def _sr_many(x, n_seeds=256):
    f = jax.jit(stochastic_round_bf16)
    outs = [np.asarray(f(x, jnp.uint32((s * 2654435761 + 13) & 0xFFFFFFFF)),
                       np.float32)
            for s in range(n_seeds)]
    return np.stack(outs)


def test_exact_values_round_exactly():
    # values representable in bf16 (low 16 bits zero) never change
    x = jnp.asarray([0.0, 1.0, -1.0, 0.5, -2.0, 3.0, 1e30, -1e-30],
                    jnp.float32)
    x = x.astype(jnp.bfloat16).astype(jnp.float32)
    out = _sr_many(x, n_seeds=8)
    np.testing.assert_array_equal(out, np.broadcast_to(np.asarray(x), out.shape))


def test_unbiased_between_grid_points():
    # x = a + frac*(b-a) for adjacent bf16 grid points a<b: the mean over
    # seeds must approach x (binomial std ~ ulp/2/sqrt(n))
    rng = np.random.default_rng(0)
    base = rng.uniform(-4, 4, size=512).astype(np.float32)
    x = jnp.asarray(base)
    outs = _sr_many(x, n_seeds=512)
    lo = np.asarray(x.astype(jnp.bfloat16).astype(jnp.float32))
    ulp = np.abs(np.spacing(np.abs(lo).astype(np.float32), dtype=np.float32))
    # bf16 ulp = 2^16 * f32 ulp at the same magnitude (16 dropped bits)
    mean = outs.mean(0)
    err = np.abs(mean - base)
    tol = 65536 * ulp * 0.5 / np.sqrt(512) * 6 + 1e-12  # 6 sigma
    assert (err <= tol).mean() > 0.99


def test_rounds_to_adjacent_grid_points_only():
    x = jnp.asarray(np.random.default_rng(1).normal(size=1024).astype(np.float32))
    outs = _sr_many(x, n_seeds=16)
    down = np.asarray(
        jax.lax.bitcast_convert_type(
            (jax.lax.bitcast_convert_type(x, jnp.uint32) >> 16)
            .astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32))
    up = np.asarray(
        jax.lax.bitcast_convert_type(
            ((jax.lax.bitcast_convert_type(x, jnp.uint32) >> 16) + 1)
            .astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32))
    for o in outs:
        assert np.all((o == down) | (o == up))


def test_negative_symmetry_unbiased():
    x = jnp.asarray(np.linspace(-1.001, -0.999, 64, dtype=np.float32))
    outs = _sr_many(x, n_seeds=512)
    # ulp(1.0) in bf16 = 2^-7; std of the 512-seed mean <= 1.7e-4; 7 sigma
    np.testing.assert_allclose(outs.mean(0), np.asarray(x), rtol=0, atol=1.2e-3)


def test_nonfinite_passthrough():
    x = jnp.asarray([np.inf, -np.inf, np.nan], jnp.float32)
    out = np.asarray(stochastic_round_bf16(x, jnp.uint32(7)), np.float32)
    assert np.isposinf(out[0]) and np.isneginf(out[1]) and np.isnan(out[2])


def test_tree_rounding_decorrelates_leaves():
    # ulp(1.0) = 2^-7, so 1 + 2^-10 sits 1/8 of the way up the grid cell
    x = jnp.full((1000,), 1.0 + 2 ** -10, jnp.float32)
    tree = {"a": x, "b": x}
    out = stochastic_round_tree_bf16(tree, jnp.uint32(42))
    a = np.asarray(out["a"], np.float32)
    b = np.asarray(out["b"], np.float32)
    assert not np.array_equal(a, b)  # different dither per leaf
    # each still rounds up ~12.5% of the time
    up_frac_a = (a > 1.0).mean()
    up_frac_b = (b > 1.0).mean()
    assert 0.07 < up_frac_a < 0.18 and 0.07 < up_frac_b < 0.18


def test_dtype_guard():
    with pytest.raises(AssertionError):
        stochastic_round_bf16(jnp.zeros(3, jnp.bfloat16), jnp.uint32(0))


# ---- param_storage_dtype="bfloat16" through the trainer ----

def _train(param_dtype, seed=0, epochs=3):
    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

    splits = load_dataset("mnist", n_train_synth=256, n_test_synth=128)
    arrays = make_federated_arrays(splits, num_clients=4, strategy="iid",
                                   samples_per_client=32, seed=seed)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(
            local_epochs=epochs, batch_size=16, learning_rate=0.003,
            param_storage_dtype=param_dtype),
        seed=seed,
    )
    x, y = splits.test_images, splits.test_labels
    eng = FederatedRoundEngine(create_model("simple_cnn"), arrays, cfg,
                               test_images=x, test_labels=y)
    results = [eng.run_round() for _ in range(3)]
    return eng, results


def test_bf16_param_storage_trains_and_returns_f32():
    eng, results = _train("bfloat16")
    for v in eng.get_model_weights().values():
        assert v.dtype == jnp.float32
    assert results[-1].train_loss < results[0].train_loss
    assert np.isfinite(results[-1].test_accuracy)


def test_bf16_param_storage_close_to_f32():
    _, r32 = _train(None)
    _, rbf = _train("bfloat16")
    # same data/seed: rounded-storage training tracks f32 closely at this
    # scale (few steps, lr 3e-3 >> bf16 ulp effects)
    assert abs(r32[-1].train_loss - rbf[-1].train_loss) < 0.25
    assert abs(r32[-1].test_accuracy - rbf[-1].test_accuracy) < 0.15


def test_param_storage_dtype_validated():
    from fl_tpu.fl.local_training import (
        FederatedTrainingConfig, make_local_train_fn)
    from fl_tpu.models import create_model

    with pytest.raises(ValueError, match="param_storage_dtype"):
        make_local_train_fn(
            create_model("simple_cnn"),
            FederatedTrainingConfig(param_storage_dtype="float16"),
            samples_per_client=32, mean=(0.5,), std=(0.5,))
