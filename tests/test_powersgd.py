"""PowerSGD low-rank uplink compression (fl_tpu.fl.powersgd + engine)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.fl.powersgd import (
    _orthonormalize,
    apply_powersgd_with_error_feedback,
    init_uplink_state,
    make_powersgd_plan,
    powersgd_roundtrip,
)
from fl_tpu.ops.flatten import stack_flatten


def _template():
    """Unbatched variables-like pytree: two matrices + a bias vector."""
    return {
        "params": {
            "dense1": {"kernel": jnp.zeros((40, 24)),
                       "bias": jnp.zeros((24,))},
            "dense2": {"kernel": jnp.zeros((24, 16))},
        }
    }


def test_plan_layout_matches_stack_flatten():
    plan = make_powersgd_plan(_template(), rank=2)
    # leaf order (jax.tree.flatten, dict keys sorted):
    # dense1/bias (24), dense1/kernel (40x24), dense2/kernel (24x16)
    assert plan.d == 24 + 40 * 24 + 24 * 16
    assert [(e.offset, e.n, e.m) for e in plan.entries] == [
        (24, 40, 24), (24 + 960, 24, 16)]
    # Q region: one m*r block per entry, contiguous
    assert [e.q_offset for e in plan.entries] == [0, 48]
    assert plan.compression_ratio() > 4.0
    # bias is transmitted uncompressed: counted at full size
    assert plan.compressed_floats() == 24 + (40 + 24) * 2 + (24 + 16) * 2


def test_tiny_matrices_pass_through():
    tpl = {"k": jnp.zeros((3, 3))}  # (3+3)*2 >= 9 -> not worth factoring
    plan = make_powersgd_plan(tpl, rank=2)
    assert plan.entries == ()
    carried = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, plan.d_pad)), jnp.float32)
    q = jnp.zeros((2, plan.dq_pad), jnp.float32)
    out, _ = powersgd_roundtrip(carried, q, plan)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(carried))


def test_orthonormalize_produces_orthonormal_columns():
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.normal(size=(3, 50, 4)), jnp.float32)
    u = np.asarray(_orthonormalize(p))
    for c in range(3):
        gram = u[c].T @ u[c]
        np.testing.assert_allclose(gram, np.eye(4), atol=1e-5)


def test_low_rank_deltas_transmitted_exactly():
    """A delta of true rank <= r is reproduced exactly (projection onto
    col(MQ) = col(M) for random Q, almost surely)."""
    rng = np.random.default_rng(2)
    plan = make_powersgd_plan(_template(), rank=3)
    C = 2
    carried = np.zeros((C, plan.d_pad), np.float32)
    for e in plan.entries:
        a = rng.normal(size=(C, e.n, 2))  # rank 2 < rank 3
        b = rng.normal(size=(C, 2, e.m))
        carried[:, e.offset:e.offset + e.n * e.m] = \
            np.einsum("cnk,ckm->cnm", a, b).reshape(C, -1)
    carried[:, :24] = rng.normal(size=(C, 24))  # bias region: uncompressed
    q = jax.random.normal(jax.random.PRNGKey(0), (C, plan.dq_pad))
    out, _ = powersgd_roundtrip(jnp.asarray(carried), q, plan)
    np.testing.assert_allclose(np.asarray(out), carried, atol=2e-4)


def test_warm_start_converges_to_best_rank_r():
    """Repeated roundtrips on a FIXED matrix are subspace iteration: the
    reconstruction error approaches the optimal rank-r (SVD) error."""
    rng = np.random.default_rng(3)
    r = 2
    tpl = {"k": jnp.zeros((30, 20))}
    plan = make_powersgd_plan(tpl, rank=r)
    m_np = rng.normal(size=(30, 20)).astype(np.float32)
    carried = np.zeros((1, plan.d_pad), np.float32)
    carried[0, :600] = m_np.reshape(-1)
    carried = jnp.asarray(carried)
    q = jax.random.normal(jax.random.PRNGKey(1), (1, plan.dq_pad))
    errs = []
    for _ in range(8):
        out, q = powersgd_roundtrip(carried, q, plan)
        errs.append(float(jnp.linalg.norm(out[0, :600] - carried[0, :600])))
    s = np.linalg.svd(m_np, compute_uv=False)
    best = float(np.sqrt((s[r:] ** 2).sum()))
    assert errs[-1] <= errs[0] + 1e-5          # warm start never hurts
    assert errs[-1] <= best * 1.02             # near-optimal after warmup
    assert errs[-1] >= best - 1e-4             # and not below the bound


def test_error_feedback_telescopes_and_respects_mask():
    rng = np.random.default_rng(4)
    plan = make_powersgd_plan(_template(), rank=2)
    C, T = 4, 5
    state = init_uplink_state(jax.random.PRNGKey(2), plan, C)
    mask = jnp.asarray([1, 1, 1, 0], jnp.float32)
    total_tx = np.zeros((C, plan.d_pad), np.float32)
    total_delta = np.zeros((C, plan.d_pad), np.float32)
    q0 = np.asarray(state[:, plan.d_pad:]).copy()
    for _ in range(T):
        delta = jnp.asarray(rng.normal(0, 1, (C, plan.d_pad)), jnp.float32)
        tx, state = apply_powersgd_with_error_feedback(
            delta, state, mask, plan)
        assert np.abs(np.asarray(tx)[3]).max() == 0.0  # masked: no tx
        total_tx += np.asarray(tx)
        total_delta += np.asarray(delta) * np.asarray(mask)[:, None]
    ef = np.asarray(state[:, :plan.d_pad])
    np.testing.assert_allclose(
        total_tx + ef * np.asarray(mask)[:, None], total_delta,
        rtol=1e-3, atol=1e-3)
    # masked client's Q factors never move; live clients' do
    q1 = np.asarray(state[:, plan.d_pad:])
    np.testing.assert_array_equal(q1[3], q0[3])
    assert not np.allclose(q1[0], q0[0])


def _build_engine(kind, seed=7, rank=4):
    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

    mnist = load_dataset("mnist", n_train_synth=512, n_test_synth=64)
    fa = make_federated_arrays(mnist, num_clients=2, strategy="iid",
                               samples_per_client=64, seed=0)
    return FederatedRoundEngine(
        create_model("simple_cnn"), fa,
        RoundEngineConfig(
            training=FederatedTrainingConfig(local_epochs=1, batch_size=16),
            seed=seed, max_clients=2, uplink_compression=kind,
            uplink_powersgd_rank=rank,
        ),
    )


def test_engine_powersgd_learns_and_checkpoints(tmp_path):
    from fl_tpu.orchestration.checkpoint import (
        restore_engine_checkpoint,
        save_engine_checkpoint,
    )

    eng = _build_engine("powersgd")
    # state buffer = EF region + Q region
    plan = eng._powersgd_plan
    assert eng.uplink_error.shape == (2, plan.d_pad + plan.dq_pad)
    assert plan.compression_ratio() > 10.0  # SimpleCNN is fc-dominated
    mask = np.ones(2, np.float32)
    losses = [eng.run_round(mask=mask, evaluate=False).train_loss
              for _ in range(4)]
    assert losses[-1] < losses[0]
    # EF residual is live (lossy rounds) and finite; Q factors are finite
    ef_reg = np.asarray(eng.uplink_error[:, :plan.d_pad])
    assert np.isfinite(np.asarray(eng.uplink_error)).all()
    assert np.abs(ef_reg).max() > 0

    save_engine_checkpoint(eng, str(tmp_path))
    eng2 = _build_engine("powersgd")
    restore_engine_checkpoint(eng2, str(tmp_path))
    np.testing.assert_array_equal(np.asarray(eng2.uplink_error),
                                  np.asarray(eng.uplink_error))
    assert eng2.round_number == eng.round_number
    # resumed engine continues identically to the uninterrupted one
    r_a = eng.run_round(mask=mask, evaluate=False)
    r_b = eng2.run_round(mask=mask, evaluate=False)
    assert r_b.train_loss == pytest.approx(r_a.train_loss, rel=1e-6)


def test_engine_powersgd_high_rank_close_to_plain():
    """With rank ~ full width of the dominant layers' small side, the
    factorization is near-exact and a round tracks the uncompressed one."""
    plain = _build_engine("none", seed=9)
    psgd = _build_engine("powersgd", seed=9, rank=10)
    mask = np.ones(2, np.float32)
    r_p = plain.run_round(mask=mask, evaluate=False)
    r_q = psgd.run_round(mask=mask, evaluate=False)
    # local training is identical; compression touches only the uplink
    assert r_q.train_loss == pytest.approx(r_p.train_loss, rel=1e-5)
    w_p, w_q = plain.get_model_weights(), psgd.get_model_weights()
    rel = max(
        float(np.max(np.abs(np.asarray(w_q[k]) - np.asarray(w_p[k]))))
        for k in w_p)
    assert rel < 5e-2  # lossy but close at high rank


def test_engine_powersgd_on_mesh_matches_single_device(mesh8):
    """PowerSGD is per-client GEMM work (no cross-client ops), so the
    client-sharded superstep must match the unsharded one."""
    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

    mnist = load_dataset("mnist", n_train_synth=512, n_test_synth=64)

    def build(mesh):
        fa = make_federated_arrays(mnist, num_clients=8, strategy="iid",
                                   samples_per_client=16, seed=0)
        return FederatedRoundEngine(
            create_model("simple_cnn"), fa,
            RoundEngineConfig(
                training=FederatedTrainingConfig(local_epochs=1,
                                                 batch_size=8),
                seed=11, max_clients=8, uplink_compression="powersgd",
                uplink_powersgd_rank=2,
            ),
            mesh=mesh,
        )

    single, sharded = build(None), build(mesh8)
    mask = np.ones(8, np.float32)
    r1 = single.run_round(mask=mask, evaluate=False)
    r2 = sharded.run_round(mask=mask, evaluate=False)
    assert r1.train_loss == pytest.approx(r2.train_loss, rel=1e-5)
    np.testing.assert_allclose(np.asarray(sharded.uplink_error),
                               np.asarray(single.uplink_error),
                               rtol=1e-4, atol=1e-5)
    w1, w2 = single.get_model_weights(), sharded.get_model_weights()
    for k in w1:
        np.testing.assert_allclose(np.asarray(w1[k]), np.asarray(w2[k]),
                                   rtol=1e-4, atol=1e-5)


def test_make_uplink_fn_rejects_powersgd():
    from fl_tpu.fl.uplink import make_uplink_fn

    with pytest.raises(ValueError, match="powersgd"):
        make_uplink_fn("powersgd")
