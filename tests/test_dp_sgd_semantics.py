"""DP-SGD mechanism semantics: per-example clipping, padded-slot masking,
noise calibration — the properties the RDP certificate rests on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.fl.privacy import make_dp_sgd_grad_fn


def quadratic_loss(params, extra, xb, yb, dkey):
    """Per-example grad of this loss w.r.t. w is exactly x (easy to reason
    about clipping analytically)."""
    del extra, yb, dkey
    return jnp.sum(params["w"] * xb.mean(0)), None


def linear_model_loss(params, extra, xb, yb, dkey):
    del extra, dkey
    logits = xb @ params["w"]
    import optax

    return optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean(), None


def test_padded_slots_contribute_zero():
    """wmask=0 slots must contribute exactly nothing: the grad with hostile
    content in masked slots equals the grad with zeros there."""
    dp_fn = make_dp_sgd_grad_fn(linear_model_loss, max_grad_norm=1.0,
                                noise_multiplier=0.0, microbatch_size=4)
    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.normal(0, 1, (8, 4)), jnp.float32)}
    xb = jnp.asarray(rng.normal(0, 1, (8, 8)), jnp.float32)
    yb = jnp.asarray(rng.integers(0, 4, (8,)), jnp.int32)
    wmask = jnp.asarray([1, 1, 1, 1, 0, 0, 0, 0], jnp.float32)
    key = jax.random.PRNGKey(0)

    g1 = dp_fn(params, {}, xb, yb, wmask, key, key)
    hostile = xb.at[4:].set(1e3)
    g2 = dp_fn(params, {}, hostile, yb, wmask, key, key)
    np.testing.assert_allclose(np.asarray(g1["w"]), np.asarray(g2["w"]),
                               rtol=1e-6)
    # and masked-out examples really are absent: grads differ from all-ones
    g3 = dp_fn(params, {}, xb, yb, jnp.ones(8, jnp.float32), key, key)
    assert not np.allclose(np.asarray(g1["w"]), np.asarray(g3["w"]))


def test_per_example_clip_bounds_single_example_influence():
    """Swapping ONE example changes the (noise-free) mean grad by at most
    2·C/B in L2 — the sensitivity bound the Gaussian mechanism needs,
    regardless of how extreme the example is."""
    C, B = 1.0, 8
    dp_fn = make_dp_sgd_grad_fn(linear_model_loss, max_grad_norm=C,
                                noise_multiplier=0.0, microbatch_size=4)
    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.normal(0, 1, (8, 4)), jnp.float32)}
    xb = jnp.asarray(rng.normal(0, 1, (B, 8)), jnp.float32)
    yb = jnp.asarray(rng.integers(0, 4, (B,)), jnp.int32)
    ones = jnp.ones(B, jnp.float32)
    key = jax.random.PRNGKey(0)

    g_base = dp_fn(params, {}, xb, yb, ones, key, key)
    poisoned = xb.at[3].set(1e4)
    g_poison = dp_fn(params, {}, poisoned, yb, ones, key, key)
    diff = np.linalg.norm(np.asarray(g_base["w"]) - np.asarray(g_poison["w"]))
    assert diff <= 2 * C / B + 1e-6


def test_noise_scale_is_zC_over_B():
    """With zero gradients the output is pure noise with std z·C/B."""
    def zero_loss(params, extra, xb, yb, dkey):
        del extra, xb, yb, dkey
        return 0.0 * jnp.sum(params["w"]), None

    z, C, B = 4.0, 2.0, 16
    dp_fn = make_dp_sgd_grad_fn(zero_loss, max_grad_norm=C,
                                noise_multiplier=z, microbatch_size=8)
    params = {"w": jnp.zeros((64, 64), jnp.float32)}
    xb = jnp.zeros((B, 4), jnp.float32)
    yb = jnp.zeros((B,), jnp.int32)
    g = dp_fn(params, {}, xb, yb, jnp.ones(B, jnp.float32),
              jax.random.PRNGKey(0), jax.random.PRNGKey(7))
    observed = float(np.std(np.asarray(g["w"])))
    assert observed == pytest.approx(z * C / B, rel=0.05)


def test_local_training_dp_masks_exactly_the_padded_slots():
    """End-to-end through make_local_train_fn: with a 32-slot shard holding
    16 valid examples, exactly 16 slots across the epoch must be masked out
    of the DP gradient (the pre-fix remapping showed all slots as valid,
    processing duplicated examples the accountant never charged for).

    Probe: a dp_sgd_fn that RETURNS the per-batch valid count through the
    gradient (constant tree = wmask.sum()); with plain SGD the total param
    displacement is then lr · Σ_steps wmask.sum() = lr · n_valid, directly
    observable from the returned params."""
    from fl_tpu.fl.local_training import (
        FederatedTrainingConfig,
        make_local_train_fn,
    )
    from fl_tpu.models import create_model

    model = create_model("simple_cnn")
    lr = 0.5
    cfg = FederatedTrainingConfig(local_epochs=1, batch_size=8,
                                  optimizer_type="sgd", learning_rate=lr,
                                  momentum=0.0)

    def probe_dp_fn(grads, params, extra, xb, yb, wmask, dkey, nkey):
        # grads is None (the plain batch gradient is not computed in DP
        # mode); shape the probe output from params
        return jax.tree.map(lambda p: jnp.full_like(p, wmask.sum()), params)

    fn = make_local_train_fn(
        model, cfg, samples_per_client=32,
        mean=np.zeros(1, np.float32), std=np.ones(1, np.float32),
        dp_sgd_fn=probe_dp_fn,
    )
    variables = model.init(jax.random.PRNGKey(0))
    images = jnp.zeros((32, 28, 28, 1), jnp.uint8)
    labels = jnp.zeros((32,), jnp.int32)

    for n_valid in (16, 32):
        out, _ = fn(variables, images, labels,
                    jnp.asarray(n_valid, jnp.int32),
                    jnp.asarray(1, jnp.int32), jax.random.PRNGKey(1))
        w0 = np.asarray(jax.tree.leaves(variables["params"])[0])
        w1 = np.asarray(jax.tree.leaves(out["params"])[0])
        # every element moved by -lr * Σ wmask.sum() = -lr * n_valid
        np.testing.assert_allclose(w0 - w1, lr * n_valid, rtol=1e-5)


def test_homogeneous_epochs_fast_path_matches_masked_path():
    """homogeneous_epochs=True must be bit-identical to the masked path when
    every client runs the full epoch budget (the condition under which the
    round engine enables it)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fl_tpu.fl.local_training import (
        FederatedTrainingConfig,
        make_local_train_fn,
    )
    from fl_tpu.models import create_model

    model = create_model("simple_cnn")
    cfg = FederatedTrainingConfig(local_epochs=2, batch_size=8,
                                  optimizer_type="adam")
    kwargs = dict(samples_per_client=16,
                  mean=np.zeros(1, np.float32), std=np.ones(1, np.float32))
    fn_masked = make_local_train_fn(model, cfg, **kwargs)
    fn_fast = make_local_train_fn(model, cfg, homogeneous_epochs=True,
                                  **kwargs)

    variables = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)
    images = jax.random.randint(key, (16, 28, 28, 1), 0, 256, jnp.uint8)
    labels = jax.random.randint(key, (16,), 0, 10, jnp.int32)
    args = (variables, images, labels, jnp.asarray(16, jnp.int32),
            jnp.asarray(2, jnp.int32), jax.random.PRNGKey(1))

    out_m, met_m = fn_masked(*args)
    out_f, met_f = fn_fast(*args)
    for a, b in zip(jax.tree.leaves(out_m), jax.tree.leaves(out_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(float(met_m["loss"]), float(met_f["loss"]),
                               rtol=1e-6)


def test_ghost_dp_sgd_matches_microbatch_impl():
    """Ghost-norm two-pass DP-SGD must produce the same noisy gradient as
    the per-example microbatch implementation, given the same inputs and
    noise key (dropout disabled: the microbatch path applies one
    single-example mask to every example while the ghost path draws a
    batch-shaped mask — with rate 0 both are the identity)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fl_tpu.fl.local_training import cross_entropy_loss
    from fl_tpu.fl.privacy import (
        make_dp_sgd_grad_fn,
        make_ghost_dp_sgd_grad_fn,
        model_supports_ghost_dp,
    )
    from fl_tpu.models import create_model

    model = create_model("simple_cnn", dropout_rate=0.0)
    assert model_supports_ghost_dp(model)
    variables = model.init(jax.random.PRNGKey(0))
    params = variables["params"]

    def loss_fn(p, extra, xb, yb, dkey):
        logits, _ = model.apply({"params": p, **extra}, xb, train=True,
                                dropout_rng=dkey)
        return cross_entropy_loss(logits, yb), None

    C, z = 0.7, 1.1
    micro = make_dp_sgd_grad_fn(loss_fn, C, z, microbatch_size=4)
    ghost = make_ghost_dp_sgd_grad_fn(model, C, z)

    B = 8
    kx, ky = jax.random.split(jax.random.PRNGKey(5))
    xb = jax.random.normal(kx, (B, 28, 28, 1), jnp.float32)
    yb = jax.random.randint(ky, (B,), 0, 10)
    wmask = jnp.asarray([1, 1, 1, 0, 1, 1, 0, 1], jnp.float32)
    dkey = jax.random.PRNGKey(1)
    nkey = jax.random.PRNGKey(2)

    ghost_chunked = make_ghost_dp_sgd_grad_fn(model, C, z, norm_chunk=4)

    g_micro = micro(params, {}, xb, yb, wmask, dkey, nkey)
    for impl in (ghost, ghost_chunked):
        g_ghost = impl(params, {}, xb, yb, wmask, dkey, nkey)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_micro),
            jax.tree_util.tree_leaves_with_path(g_ghost),
        ):
            assert pa == pb
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5,
                                       err_msg=str(pa))


def test_cifar_groupnorm_ghost_matches_microbatch():
    """CIFAR10CNN(norm='group'): ghost-norm DP-SGD (incl. the groupnorm
    scale/bias layer kind) equals the microbatched per-example path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fl_tpu.fl.local_training import cross_entropy_loss
    from fl_tpu.fl.privacy import (
        make_dp_sgd_grad_fn,
        make_ghost_dp_sgd_grad_fn,
        model_supports_ghost_dp,
    )
    from fl_tpu.models import create_model

    batch_model = create_model("cifar10_cnn")
    assert not model_supports_ghost_dp(batch_model)  # BN variant: unsound
    model = create_model("cifar10_cnn", norm="group", dropout_rate=0.0)
    assert model_supports_ghost_dp(model)
    variables = model.init(jax.random.PRNGKey(0))
    assert "batch_stats" not in variables
    params = variables["params"]

    def loss_fn(p, extra, xb, yb, dkey):
        logits, _ = model.apply({"params": p, **extra}, xb, train=True,
                                dropout_rng=dkey)
        return cross_entropy_loss(logits, yb), None

    C, z = 0.9, 1.3
    micro = make_dp_sgd_grad_fn(loss_fn, C, z, microbatch_size=2)
    ghost = make_ghost_dp_sgd_grad_fn(model, C, z)

    B = 4
    kx, ky = jax.random.split(jax.random.PRNGKey(6))
    xb = jax.random.normal(kx, (B, 32, 32, 3), jnp.float32)
    yb = jax.random.randint(ky, (B,), 0, 10)
    wmask = jnp.asarray([1, 1, 0, 1], jnp.float32)
    g_micro = micro(params, {}, xb, yb, wmask, jax.random.PRNGKey(1),
                    jax.random.PRNGKey(2))
    g_ghost = ghost(params, {}, xb, yb, wmask, jax.random.PRNGKey(1),
                    jax.random.PRNGKey(2))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_micro),
        jax.tree_util.tree_leaves_with_path(g_ghost),
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5, err_msg=str(pa))


def test_dp_sgd_with_batchnorm_model_refused():
    import pytest as _pytest

    from fl_tpu.core.types import PrivacyConfig
    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

    cifar = load_dataset("cifar10", n_train_synth=64, n_test_synth=32)
    fa = make_federated_arrays(cifar, num_clients=2, strategy="iid",
                               samples_per_client=16, seed=0)
    with _pytest.raises(ValueError, match="BatchNorm is unsound"):
        FederatedRoundEngine(
            create_model("cifar10_cnn"), fa,
            RoundEngineConfig(
                training=FederatedTrainingConfig(local_epochs=1,
                                                 batch_size=8),
                dp_mode="dp_sgd",
                privacy=PrivacyConfig(epsilon=1.0, delta=1e-5,
                                      max_grad_norm=1.0,
                                      noise_multiplier=1.0),
            ),
        )


def test_fedprox_proximal_term_pulls_toward_global():
    """FedProx: μ>0 keeps local params closer to the round-start global
    model than plain local training; μ=0 is exactly the plain path; the
    proximal gradient matches autodiff of (μ/2)·||w - w_g||²."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fl_tpu.fl.local_training import (
        FederatedTrainingConfig,
        make_local_train_fn,
    )
    from fl_tpu.models import create_model

    model = create_model("simple_cnn", dropout_rate=0.0)
    variables = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)
    images = jax.random.randint(key, (32, 28, 28, 1), 0, 256, jnp.uint8)
    labels = jax.random.randint(key, (32,), 0, 10, jnp.int32)
    kwargs = dict(samples_per_client=32,
                  mean=np.zeros(1, np.float32), std=np.ones(1, np.float32))
    args = (variables, images, labels, jnp.asarray(32, jnp.int32),
            jnp.asarray(2, jnp.int32), jax.random.PRNGKey(1))

    def dist(out):
        return float(sum(
            jnp.sum(jnp.square(a - b)) for a, b in zip(
                jax.tree.leaves(out["params"]),
                jax.tree.leaves(variables["params"]))))

    def run(mu):
        cfg = FederatedTrainingConfig(local_epochs=2, batch_size=8,
                                      optimizer_type="sgd", momentum=0.0,
                                      learning_rate=0.1, proximal_mu=mu)
        out, _ = make_local_train_fn(model, cfg, **kwargs)(*args)
        return out

    out0 = run(0.0)
    out_base = run(0.0)
    for a, b in zip(jax.tree.leaves(out0), jax.tree.leaves(out_base)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    d0, d_prox = dist(out0), dist(run(5.0))
    assert d_prox < d0  # pulled toward the global anchor
    assert d_prox > 0   # but still learned something
