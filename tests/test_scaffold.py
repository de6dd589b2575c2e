"""SCAFFOLD control variates (fl_tpu.fl.scaffold + engine wiring).

Capability extension over the reference (plain FedAvg only,
src/shared/fedavg.py) — Karimireddy et al. 2020, Algorithm 1, Option II.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models import create_model
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig


@pytest.fixture(scope="module")
def mnist():
    return load_dataset("mnist", n_train_synth=512, n_test_synth=128)


def make_engine(mnist, num_clients=8, scaffold=True, strategy="pathological",
                seed=0, mesh=None, epochs=3, lr=0.05, participation=1.0,
                **cfg_kw):
    model = create_model("simple_cnn")
    fa = make_federated_arrays(mnist, num_clients=num_clients,
                               strategy=strategy, samples_per_client=32,
                               seed=seed)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(
            local_epochs=epochs, batch_size=8, learning_rate=lr,
            optimizer_type="sgd", momentum=0.0),
        scaffold=scaffold, seed=seed, min_clients=1,
        participation_rate=participation, **cfg_kw,
    )
    return FederatedRoundEngine(model, fa, cfg, mesh=mesh)


# ---- config validation ----

def test_scaffold_rejects_momentum_and_adam(mnist):
    fa = make_federated_arrays(mnist, num_clients=2, strategy="iid",
                               samples_per_client=16, seed=0)
    model = create_model("simple_cnn")
    for tcfg in (FederatedTrainingConfig(optimizer_type="adam"),
                 FederatedTrainingConfig(optimizer_type="sgd", momentum=0.9)):
        with pytest.raises(ValueError, match="plain SGD"):
            FederatedRoundEngine(
                model, fa, RoundEngineConfig(training=tcfg, scaffold=True))


def test_scaffold_rejects_dp_and_secagg(mnist):
    from fl_tpu.core.types import PrivacyConfig

    fa = make_federated_arrays(mnist, num_clients=2, strategy="iid",
                               samples_per_client=16, seed=0)
    model = create_model("simple_cnn")
    t = FederatedTrainingConfig(optimizer_type="sgd", momentum=0.0)
    with pytest.raises(ValueError, match="not privatized"):
        FederatedRoundEngine(model, fa, RoundEngineConfig(
            training=t, scaffold=True, dp_mode="delta",
            privacy=PrivacyConfig(epsilon=1.0, delta=1e-5)))
    with pytest.raises(ValueError, match="secure aggregation"):
        FederatedRoundEngine(model, fa, RoundEngineConfig(
            training=t, scaffold=True, secure_aggregation=True))


def test_scaffold_rejects_bf16_param_storage(mnist):
    fa = make_federated_arrays(mnist, num_clients=2, strategy="iid",
                               samples_per_client=16, seed=0)
    with pytest.raises(ValueError, match="param_storage_dtype"):
        FederatedRoundEngine(
            create_model("simple_cnn"), fa,
            RoundEngineConfig(training=FederatedTrainingConfig(
                optimizer_type="sgd", momentum=0.0,
                param_storage_dtype="bfloat16"), scaffold=True))


def test_zero_epoch_participant_keeps_variate(mnist):
    """A participating client whose epoch budget is 0 took no local
    steps — its control variate must not move (it would otherwise be
    dragged by -c with no trajectory behind it)."""
    eng = make_engine(mnist, num_clients=4, epochs=2)
    eng.run_round(mask=np.ones(4, np.float32), evaluate=False)  # warm c
    eng.epochs_per_client = np.array([0, 2, 2, 2], np.int32)
    before = np.asarray(eng.scaffold_ci).copy()
    eng.run_round(mask=np.ones(4, np.float32), evaluate=False)
    after = np.asarray(eng.scaffold_ci)
    np.testing.assert_array_equal(after[0], before[0])
    assert not np.array_equal(after[1], before[1])


def test_scaffold_rejects_fused_rounds(mnist):
    eng = make_engine(mnist, num_clients=2, epochs=1)
    with pytest.raises(ValueError, match="fused"):
        eng.run_rounds_fused(2)


# ---- Option II exactness ----

def test_option_ii_identity_single_client(mnist):
    """With one client, zero initial variates, and full participation,
    round 0 is plain local SGD and the post-round state must satisfy the
    exact Option II identity c_1+ = -(w_local - w_global)/(K*lr), with
    the server variate equal to it (N=1)."""
    from fl_tpu.ops.flatten import stack_flatten

    lr, epochs = 0.05, 2
    eng = make_engine(mnist, num_clients=1, strategy="iid",
                      epochs=epochs, lr=lr)
    old = {k: np.asarray(v, np.float32)
           for k, v in eng.get_model_weights().items()}
    eng.run_round(mask=np.ones(1, np.float32), evaluate=False)
    new = {k: np.asarray(v, np.float32)
           for k, v in eng.get_model_weights().items()}

    steps_per_epoch = 32 // 8
    K = epochs * steps_per_epoch
    delta_tree = {"params": {}}
    # rebuild the engine's flatten ordering via stack_flatten on the
    # params tree with a singleton client axis
    import jax

    delta = jax.tree.map(
        lambda a, b: (jnp.asarray(a) - jnp.asarray(b))[None],
        new, old)
    d_mat, _ = stack_flatten(delta)
    expect = -np.asarray(d_mat)[0] / (K * lr)
    got_ci = np.asarray(eng.scaffold_ci)[0]
    np.testing.assert_allclose(got_ci, expect, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(eng.scaffold_c), expect,
                               rtol=1e-4, atol=1e-6)


def test_mean_ci_equals_c_invariant(mnist):
    """The paper's invariant c == mean_i(c_i) is preserved under both
    full and partial participation (the server moves by the participant
    sum over N)."""
    eng = make_engine(mnist, num_clients=8, epochs=2, participation=1.0)
    rng = np.random.default_rng(7)
    for r in range(4):
        # alternate full and partial participation masks
        if r % 2 == 0:
            mask = np.ones(8, np.float32)
        else:
            mask = (rng.random(8) < 0.5).astype(np.float32)
            mask[0] = 1.0  # at least one participant
        eng.run_round(mask=mask, evaluate=False)
        c = np.asarray(eng.scaffold_c)
        ci_mean = np.asarray(eng.scaffold_ci).mean(axis=0)
        np.testing.assert_allclose(ci_mean, c, rtol=1e-5, atol=1e-7)
    # and the variates are actually nonzero (the correction is live)
    assert float(np.abs(np.asarray(eng.scaffold_c)).max()) > 0


def test_nonparticipants_keep_their_variates(mnist):
    eng = make_engine(mnist, num_clients=4, epochs=1)
    eng.run_round(mask=np.ones(4, np.float32), evaluate=False)
    before = np.asarray(eng.scaffold_ci).copy()
    mask = np.array([1, 0, 1, 0], np.float32)
    eng.run_round(mask=mask, evaluate=False)
    after = np.asarray(eng.scaffold_ci)
    np.testing.assert_array_equal(after[1], before[1])
    np.testing.assert_array_equal(after[3], before[3])
    assert not np.array_equal(after[0], before[0])


# ---- behavior ----

def test_scaffold_trains_and_differs_from_fedavg(mnist):
    """Round 0 is exactly plain FedAvg (zero variates); later rounds
    apply nonzero corrections, so the trajectory departs while staying
    finite. (On pathological shards the LOCAL train loss is *expected*
    to rise vs plain FedAvg — corrections pull clients away from
    memorizing their own 1-2-class shard — so no winner is asserted
    here; the algorithm's math is pinned exactly by the Option II
    identity and mean-invariant tests above.)"""
    plain = make_engine(mnist, scaffold=False, num_clients=8, epochs=3)
    scaf = make_engine(mnist, scaffold=True, num_clients=8, epochs=3)
    mask = np.ones(8, np.float32)
    rp = [plain.run_round(mask=mask, evaluate=False) for _ in range(4)]
    rs = [scaf.run_round(mask=mask, evaluate=False) for _ in range(4)]
    # round 0 identical (zero variates), later rounds diverge
    assert abs(rp[0].train_loss - rs[0].train_loss) < 1e-5
    assert abs(rp[-1].train_loss - rs[-1].train_loss) > 1e-6
    assert np.isfinite(rs[-1].train_loss)
    for v in scaf.get_model_weights().values():
        assert np.isfinite(np.asarray(v)).all()


def test_scaffold_mesh_matches_single_device(mnist, mesh8):
    single = make_engine(mnist, num_clients=8, seed=3, epochs=2)
    sharded = make_engine(mnist, num_clients=8, seed=3, epochs=2,
                          mesh=mesh8)
    mask = np.ones(8, np.float32)
    for _ in range(2):
        a = single.run_round(mask=mask, evaluate=False)
        b = sharded.run_round(mask=mask, evaluate=False)
    np.testing.assert_allclose(a.train_loss, b.train_loss,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(single.scaffold_c),
                               np.asarray(sharded.scaffold_c),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(single.scaffold_ci),
                               np.asarray(sharded.scaffold_ci),
                               rtol=1e-4, atol=1e-6)
    for k, v in single.get_model_weights().items():
        np.testing.assert_allclose(np.asarray(v),
                                   np.asarray(sharded.get_model_weights()[k]),
                                   rtol=1e-4, atol=1e-6)


def test_scaffold_checkpoint_roundtrip(mnist, tmp_path):
    from fl_tpu.orchestration.checkpoint import (
        restore_engine_checkpoint,
        save_engine_checkpoint,
    )

    eng = make_engine(mnist, num_clients=4, epochs=2)
    mask = np.ones(4, np.float32)
    eng.run_round(mask=mask, evaluate=False)
    eng.run_round(mask=mask, evaluate=False)
    save_engine_checkpoint(eng, str(tmp_path))

    fresh = make_engine(mnist, num_clients=4, epochs=2)
    restore_engine_checkpoint(fresh, str(tmp_path))
    np.testing.assert_allclose(np.asarray(fresh.scaffold_c),
                               np.asarray(eng.scaffold_c))
    np.testing.assert_allclose(np.asarray(fresh.scaffold_ci),
                               np.asarray(eng.scaffold_ci))
    a = eng.run_round(mask=mask, evaluate=False)
    b = fresh.run_round(mask=mask, evaluate=False)
    np.testing.assert_allclose(a.train_loss, b.train_loss,
                               rtol=1e-5, atol=1e-7)
