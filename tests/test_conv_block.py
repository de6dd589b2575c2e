"""Numerics of the fused Pallas conv-stack (fl_tpu.ops.conv_block) vs the
standard XLA chain (conv → relu → pool → conv → relu → pool), including the
pool/group argmax tie-breaking and the weight-gradient adjoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.ops.conv_block import conv_stack, lift_stem, unlift_stem_grads
from fl_tpu.ops.pool_vjp import _pool_fwd_raw as pool2x2


def ref_stack(x, w1, b1, w2, b2):
    """The standard formulation (reference models_pytorch.py:82-97 conv
    segment) built from lax primitives — the ground truth."""
    conv = lambda v, w: jax.lax.conv_general_dilated(  # noqa: E731
        v, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    a1 = jax.nn.relu(conv(x, w1) + b1)
    x2 = pool2x2(a1)
    a2 = jax.nn.relu(conv(x2, w2) + b2)
    return pool2x2(a2)


def _params(key, c1=32, c2=64, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    w1 = jax.random.normal(k1, (3, 3, 1, c1), dtype) * 0.5
    b1 = jax.random.normal(k2, (c1,), dtype) * 0.1
    w2 = jax.random.normal(k3, (3, 3, c1, c2), dtype) * 0.1
    b2 = jax.random.normal(k4, (c2,), dtype) * 0.1
    return w1, b1, w2, b2


def test_forward_matches_reference_f32():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 28, 28, 1))
    w1, b1, w2, b2 = _params(key)
    got = conv_stack(x, w1, b1, w2, b2)
    want = ref_stack(x, w1, b1, w2, b2)
    assert got.shape == want.shape == (4, 7, 7, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_matches_reference_small_geometry():
    # H=8 plane (16x16 image) exercises the Wp rounding paths
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 1))
    w1, b1, w2, b2 = _params(key, c1=8, c2=16)
    got = conv_stack(x, w1, b1, w2, b2)
    want = ref_stack(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_reference_f32():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 28, 28, 1))
    w1, b1, w2, b2 = _params(key)
    r = jax.random.normal(jax.random.PRNGKey(11), (4, 7, 7, 64))

    def loss(stack, params):
        return jnp.sum(stack(x, *params) * r)

    g_got = jax.grad(lambda p: loss(conv_stack, p))((w1, b1, w2, b2))
    g_want = jax.grad(lambda p: loss(ref_stack, p))((w1, b1, w2, b2))
    for got, want, name in zip(g_got, g_want, ("dw1", "db1", "dw2", "db2")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4,
            err_msg=name)


def test_pool_tie_breaking_first_match():
    """Constant plateaus force ties in every pool window and in the
    group max; the routed gradients must match select-and-scatter's
    first-match convention exactly (via the reference chain's VJP)."""
    key = jax.random.PRNGKey(4)
    w1, b1, w2, b2 = _params(key)
    x = jnp.ones((2, 28, 28, 1))  # fully tied activations everywhere
    r = jax.random.normal(jax.random.PRNGKey(5), (2, 7, 7, 64))

    def loss(stack, params):
        return jnp.sum(stack(x, *params) * r)

    g_got = jax.grad(lambda p: loss(conv_stack, p))((w1, b1, w2, b2))
    g_want = jax.grad(lambda p: loss(ref_stack, p))((w1, b1, w2, b2))
    for got, want in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_vmapped_over_clients():
    """The op under vmap (per-client weights, the FL trainer shape) equals
    the per-client loop."""
    C = 3
    keys = jax.random.split(jax.random.PRNGKey(6), C)
    params = [jnp.stack(t) for t in zip(*[_params(k, c1=8, c2=16)
                                          for k in keys])]
    x = jax.random.normal(jax.random.PRNGKey(8), (C, 2, 28, 28, 1))
    got = jax.vmap(conv_stack)(x, *params)
    for c in range(C):
        want = ref_stack(x[c], *[p[c] for p in params])
        np.testing.assert_allclose(np.asarray(got[c]), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    # vmapped per-client weight GRADIENTS (exercises the cross-chunk
    # accumulator under the extra vmap grid dimension)
    r = jax.random.normal(jax.random.PRNGKey(17), (C, 2, 7, 7, 16))

    def loss(stack):
        def f(*p):
            return jnp.sum(jax.vmap(stack)(x, *p) * r)
        return f

    g_got = jax.grad(loss(conv_stack), argnums=(0, 1, 2, 3))(*params)
    g_want = jax.grad(loss(ref_stack), argnums=(0, 1, 2, 3))(*params)
    for got, want, name in zip(g_got, g_want, ("dw1", "db1", "dw2", "db2")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_lift_adjoint_roundtrip():
    """<L(w), u> == <w, L^T(u)> for random u — the stem-weight lift and
    its gradient unlift are exact adjoints."""
    w1 = jax.random.normal(jax.random.PRNGKey(12), (3, 3, 1, 8))
    b1 = jax.random.normal(jax.random.PRNGKey(13), (8,))
    u_w = jax.random.normal(jax.random.PRNGKey(14), (36, 32))
    u_b = jax.random.normal(jax.random.PRNGKey(15), (32,))
    w1s, b1s = lift_stem(w1, b1)
    dw1, db1 = unlift_stem_grads(u_w, u_b, 8)
    lhs = jnp.sum(w1s * u_w) + jnp.sum(b1s * u_b)
    rhs = jnp.sum(w1 * dw1) + jnp.sum(b1 * db1)
    assert float(lhs) == pytest.approx(float(rhs), rel=1e-5)


def test_s2d_lift_matches_conv_pallas_lift():
    """The explicit lift matrix reproduces conv_pallas.s2d_stem_weights."""
    from fl_tpu.ops.conv_pallas import s2d_stem_weights

    w1 = jax.random.normal(jax.random.PRNGKey(16), (3, 3, 1, 8))
    want = s2d_stem_weights(w1).reshape(36, 32)
    got, _ = lift_stem(w1, jnp.zeros((8,)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def _stacked_params(key, P=2, c1=32, c2=64, dtype=jnp.float32):
    keys = jax.random.split(key, P)
    return tuple(jnp.stack(t) for t in zip(*[_params(k, c1, c2, dtype)
                                             for k in keys]))


def test_packed_forward_matches_per_client():
    from fl_tpu.ops.conv_block import conv_stack_packed

    P = 2
    x = jax.random.normal(jax.random.PRNGKey(21), (P, 4, 28, 28, 1))
    w1, b1, w2, b2 = _stacked_params(jax.random.PRNGKey(22), P)
    got = conv_stack_packed(x, w1, b1, w2, b2)
    want = jax.vmap(ref_stack)(x, w1, b1, w2, b2)
    assert got.shape == want.shape == (P, 4, 7, 7, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_grads_match_per_client():
    from fl_tpu.ops.conv_block import conv_stack, conv_stack_packed

    P = 2
    x = jax.random.normal(jax.random.PRNGKey(23), (P, 4, 28, 28, 1))
    params = _stacked_params(jax.random.PRNGKey(24), P)
    r = jax.random.normal(jax.random.PRNGKey(25), (P, 4, 7, 7, 64))

    def loss_packed(*p):
        return jnp.sum(conv_stack_packed(x, *p) * r)

    def loss_vmap(*p):
        return jnp.sum(jax.vmap(conv_stack)(x, *p) * r)

    g_got = jax.grad(loss_packed, argnums=(0, 1, 2, 3))(*params)
    g_want = jax.grad(loss_vmap, argnums=(0, 1, 2, 3))(*params)
    for got, want, name in zip(g_got, g_want, ("dw1", "db1", "dw2", "db2")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_packed_under_pair_vmap():
    """vmap over pairs (the 512-client → 256-pair production shape)."""
    from fl_tpu.ops.conv_block import conv_stack_packed

    pairs, P = 3, 2
    x = jax.random.normal(jax.random.PRNGKey(26), (pairs, P, 2, 28, 28, 1))
    params = _stacked_params(jax.random.PRNGKey(27), pairs * P)
    params = tuple(t.reshape((pairs, P) + t.shape[1:]) for t in params)
    got = jax.vmap(conv_stack_packed)(x, *params)
    want = jax.vmap(jax.vmap(ref_stack))(x, *params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("C", [4, 3])  # even → paired path, odd → fallback
def test_vmap_auto_pairing_matches_reference(C):
    """jax.vmap(conv_stack) over a client axis silently takes the
    channel-packed pair path when the axis is even (custom_vmap rule) —
    values and weight gradients must match the reference chain either
    way."""
    x = jax.random.normal(jax.random.PRNGKey(31), (C, 2, 28, 28, 1))
    params = _stacked_params(jax.random.PRNGKey(32), C, c1=16, c2=32)
    r = jax.random.normal(jax.random.PRNGKey(33), (C, 2, 7, 7, 32))

    def loss(stack):
        def f(*p):
            return jnp.sum(jax.vmap(stack)(x, *p) * r)
        return f

    np.testing.assert_allclose(
        np.asarray(jax.vmap(conv_stack)(x, *params)),
        np.asarray(jax.vmap(ref_stack)(x, *params)),
        rtol=1e-5, atol=1e-5)
    g_got = jax.grad(loss(conv_stack), argnums=(0, 1, 2, 3))(*params)
    g_want = jax.grad(loss(ref_stack), argnums=(0, 1, 2, 3))(*params)
    for got, want, name in zip(g_got, g_want, ("dw1", "db1", "dw2", "db2")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_model_fused_conv_block_same_tree_and_values():
    """SimpleCNN(fused_conv_block=True): identical parameter tree to the
    standard model, same forward values (f32), and a working gradient —
    FedAvg/checkpoint/serialization see no difference."""
    from fl_tpu.models import create_model

    std = create_model("simple_cnn", fast_stem_wgrad=False)
    fus = create_model("simple_cnn", fused_conv_block=True)
    x = jax.random.normal(jax.random.PRNGKey(41), (4, 28, 28, 1))
    v_std = std.init(jax.random.PRNGKey(5))
    v_fus = fus.init(jax.random.PRNGKey(5))
    assert jax.tree.structure(v_std) == jax.tree.structure(v_fus)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(v_std),
            jax.tree_util.tree_leaves_with_path(v_fus)):
        assert p1 == p2 and a.shape == b.shape and a.dtype == b.dtype
    # same weights -> same outputs
    y_std = std.module.apply(v_std, x)
    y_fus = fus.module.apply(v_std, x)
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_std),
                               rtol=1e-5, atol=1e-5)

    def loss(m, v):
        return jnp.mean(m.module.apply(v, x) ** 2)

    g_std = jax.grad(lambda v: loss(std, v))(v_std)
    g_fus = jax.grad(lambda v: loss(fus, v))(v_std)
    for (pth, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_std),
            jax.tree_util.tree_leaves_with_path(g_fus)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=str(pth))


def test_model_fused_conv_block_refuses_ghost_taps():
    from fl_tpu.models import create_model

    fus = create_model("simple_cnn", fused_conv_block=True)
    x = jnp.zeros((2, 28, 28, 1))
    with pytest.raises(ValueError, match="ghost"):
        fus.module.init(jax.random.PRNGKey(0), x, dp_capture=True)
