"""Uplink compression with error feedback (fl_tpu.fl.uplink + engine)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.fl.uplink import (
    apply_uplink_with_error_feedback,
    int8_roundtrip_matrix,
    make_uplink_fn,
    topk_roundtrip_matrix,
)


def test_int8_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    mat = jnp.asarray(rng.normal(0, 2.0, (4, 3000)), jnp.float32)
    out = int8_roundtrip_matrix(mat)
    # error per element ≤ half a quantization step of its block
    err = np.abs(np.asarray(out - mat))
    step = 2.0 * np.abs(np.asarray(mat)).max() / 254.0
    assert err.max() <= step + 1e-6
    assert not np.allclose(np.asarray(out), np.asarray(mat))  # lossy


def test_topk_keeps_exactly_k_per_row():
    rng = np.random.default_rng(1)
    mat = jnp.asarray(rng.normal(0, 1, (3, 257)), jnp.float32)
    out = np.asarray(topk_roundtrip_matrix(mat, 10))
    assert ((out != 0).sum(axis=1) == 10).all()
    # the kept entries are the 10 largest by magnitude, unchanged
    for r in range(3):
        kept = np.flatnonzero(out[r])
        top10 = np.argsort(-np.abs(np.asarray(mat[r])))[:10]
        assert set(kept) == set(top10)
        np.testing.assert_array_equal(out[r, kept],
                                      np.asarray(mat)[r, kept])


def test_error_feedback_telescopes_and_respects_mask():
    """Over T rounds, Σ transmitted = Σ deltas + e_0 − e_T (nothing is
    lost, only delayed); masked clients transmit zero and keep residuals."""
    rng = np.random.default_rng(2)
    C, D, T = 4, 600, 5
    fn = make_uplink_fn("topk", topk_keep_ratio=0.05)
    ef = jnp.zeros((C, D), jnp.float32)
    mask = jnp.asarray([1, 1, 1, 0], jnp.float32)
    total_tx = np.zeros((C, D), np.float32)
    total_delta = np.zeros((C, D), np.float32)
    for _ in range(T):
        delta = jnp.asarray(rng.normal(0, 1, (C, D)), jnp.float32)
        tx, ef = apply_uplink_with_error_feedback(delta, ef, mask, fn)
        assert np.asarray(tx)[3].max() == 0.0  # masked client sends nothing
        total_tx += np.asarray(tx)
        # masked client's delta never entered the pipeline
        total_delta += np.asarray(delta) * np.asarray(mask)[:, None]
    np.testing.assert_allclose(total_tx + np.asarray(ef) * np.asarray(
        mask)[:, None], total_delta, rtol=1e-4, atol=1e-4)


def test_engine_round_with_uplink_int8_close_to_plain():
    """int8 uplink is near-lossless: one engine round lands within
    quantization tolerance of the uncompressed round."""
    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

    mnist = load_dataset("mnist", n_train_synth=256, n_test_synth=64)
    fa = make_federated_arrays(mnist, num_clients=2, strategy="iid",
                               samples_per_client=32, seed=0)

    def build(kind):
        return FederatedRoundEngine(
            create_model("simple_cnn"), fa,
            RoundEngineConfig(
                training=FederatedTrainingConfig(local_epochs=1,
                                                 batch_size=8),
                seed=4, max_clients=2, uplink_compression=kind,
            ),
        )

    mask = np.ones(2, np.float32)
    plain, quant = build("none"), build("int8")
    r_p = plain.run_round(mask=mask, evaluate=False)
    r_q = quant.run_round(mask=mask, evaluate=False)
    assert np.isfinite(r_q.train_loss)
    assert r_q.train_loss == pytest.approx(r_p.train_loss, rel=1e-4)
    w_p, w_q = plain.get_model_weights(), quant.get_model_weights()
    for k in w_p:
        np.testing.assert_allclose(np.asarray(w_q[k]), np.asarray(w_p[k]),
                                   atol=5e-3, err_msg=k)
    # EF state is live (nonzero residual) after a lossy round
    assert float(jnp.abs(quant.uplink_error).max()) > 0


def test_engine_topk_uplink_learns_and_checkpoints(tmp_path):
    """Aggressive top-k (1%) with EF still reduces loss over rounds, and
    the EF state survives checkpoint/restore bit-exactly."""
    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig
    from fl_tpu.orchestration.checkpoint import (
        restore_engine_checkpoint,
        save_engine_checkpoint,
    )

    mnist = load_dataset("mnist", n_train_synth=512, n_test_synth=64)
    fa = make_federated_arrays(mnist, num_clients=2, strategy="iid",
                               samples_per_client=64, seed=0)

    def build():
        return FederatedRoundEngine(
            create_model("simple_cnn"), fa,
            RoundEngineConfig(
                training=FederatedTrainingConfig(local_epochs=1,
                                                 batch_size=16),
                seed=6, max_clients=2, uplink_compression="topk",
                uplink_topk_ratio=0.01,
            ),
        )

    eng = build()
    mask = np.ones(2, np.float32)
    losses = [eng.run_round(mask=mask, evaluate=False).train_loss
              for _ in range(4)]
    assert losses[-1] < losses[0]

    save_engine_checkpoint(eng, str(tmp_path))
    eng2 = build()
    restore_engine_checkpoint(eng2, str(tmp_path))
    np.testing.assert_array_equal(np.asarray(eng2.uplink_error),
                                  np.asarray(eng.uplink_error))
    assert eng2.round_number == eng.round_number


def test_uplink_config_validation():
    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

    mnist = load_dataset("mnist", n_train_synth=128, n_test_synth=32)
    fa = make_federated_arrays(mnist, num_clients=2, strategy="iid",
                               samples_per_client=16, seed=0)
    with pytest.raises(ValueError, match="uplink_compression"):
        FederatedRoundEngine(
            create_model("simple_cnn"), fa,
            RoundEngineConfig(
                training=FederatedTrainingConfig(local_epochs=1,
                                                 batch_size=8),
                uplink_compression="gzip"),
        )
    # client_dp clips after reconstruction, which would strand clipped-off
    # mass outside the EF residual — refused
    from fl_tpu.core.types import PrivacyConfig

    with pytest.raises(ValueError, match="client_dp"):
        FederatedRoundEngine(
            create_model("simple_cnn"), fa,
            RoundEngineConfig(
                training=FederatedTrainingConfig(local_epochs=1,
                                                 batch_size=8),
                dp_mode="client_dp",
                privacy=PrivacyConfig(1.0, 1e-5, noise_multiplier=1.0),
                uplink_compression="topk"),
        )


def test_make_uplink_fn_none_is_identity():
    import jax.numpy as jnp

    fn = make_uplink_fn("none")
    mat = jnp.arange(6.0).reshape(2, 3)
    np.testing.assert_array_equal(np.asarray(fn(mat)), np.asarray(mat))


def test_topk_budget_uses_unpadded_dim():
    import jax.numpy as jnp

    fn = make_uplink_fn("topk", topk_keep_ratio=0.01, d_valid=10_000)
    mat = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 10_112)),
                      jnp.float32)  # lane-padded width
    out = np.asarray(fn(mat))
    assert ((out != 0).sum(axis=1) == 100).all()  # 1% of 10000, not 10112
