"""Always-on collective-schedule audit (VERDICT r3 #4).

Round 3 found the GSPMD formulation of the sharded superstep silently
compiled SIX per-step all-gathers of client-folded conv tensors; the
shard_map rewrite brought the schedule down to exactly two all-reduces
(model-delta tuple + metric scalars, ~1.7 MB/round at bench scale). This
test keeps that schedule an invariant: any regression that reintroduces
data-bearing all-gathers (or fattens the reduce payload) fails CI, not a
post-hoc script run.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.core.types import PrivacyConfig
from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models import create_model
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig
from fl_tpu.parallel.hlo_audit import collective_inventory, type_bytes


def test_type_bytes_parses_tuples_and_scalars():
    assert type_bytes("f32[8]") == 32
    assert type_bytes("bf16[2,3]") == 12
    assert type_bytes("(f32[421770], f32[], u32[4])") == 421770 * 4 + 4 + 16
    assert type_bytes("pred[]") == 1


def test_bench_superstep_collective_schedule(mesh8):
    """The bench-config (delta-DP FedAvg) superstep over an 8-device mesh:
    exactly 2 all-reduces, no other collective kinds, total payload under
    1.8 MB — one model-delta reduce + one metrics reduce, nothing else.

    Collective structure is shape-independent, so tiny client/sample
    counts audit the exact program a slice runs (the bench model has
    ~422K params; this one is identical architecture)."""
    clients, spc = 16, 16
    splits = load_dataset("mnist", n_train_synth=clients * spc,
                          n_test_synth=64)
    arrays = make_federated_arrays(splits, num_clients=clients,
                                   strategy="iid", samples_per_client=spc,
                                   seed=0)
    engine = FederatedRoundEngine(
        create_model("simple_cnn", dtype=jnp.float32), arrays,
        RoundEngineConfig(
            training=FederatedTrainingConfig(
                local_epochs=1, batch_size=8,
                optimizer_state_dtype="bfloat16"),
            dp_mode="delta",
            privacy=PrivacyConfig(epsilon=1.0, delta=1e-5,
                                  max_grad_norm=1.0),
            epsilon_per_round=0.1, delta_per_round=1e-6,
            max_clients=clients, seed=0),
        mesh=mesh8)

    args = (
        engine.global_variables,
        jnp.asarray(0, jnp.int32),
        jnp.ones((clients,), jnp.float32),
        jnp.asarray(np.asarray(engine.epochs_per_client)),
        engine.data.images,
        engine.data.labels,
        engine.data.num_samples,
        engine.uplink_error,
    )
    hlo = engine._superstep.lower(*args).compile().as_text()
    found = collective_inventory(hlo)

    kinds = sorted(c.kind for c in found)
    assert kinds == ["all-reduce", "all-reduce"], (
        f"collective schedule regressed: {found} — the FedAvg path must "
        "be exactly two all-reduces (model delta + metrics); all-gathers "
        "mean GSPMD-style repartitioning crept back in")
    total = sum(c.nbytes for c in found)
    assert total <= 1_800_000, (
        f"collective payload {total} B exceeds the 1.8 MB budget "
        f"(~1.69 MB = model-delta tuple + metric scalars): {found}")
    # the model-delta reduce dominates; metrics are scalar-ish
    assert min(c.nbytes for c in found) < 4096


def test_robust_aggregation_gathers_are_inherent(mesh8):
    """Contrast pin: trimmed-mean aggregation legitimately all-gathers the
    stacked client deltas (coordinate-wise sort needs them all). The audit
    must see at least one all-gather here — proving the FedAvg assertion
    above isn't vacuous."""
    clients, spc = 16, 16
    splits = load_dataset("mnist", n_train_synth=clients * spc,
                          n_test_synth=64)
    arrays = make_federated_arrays(splits, num_clients=clients,
                                   strategy="iid", samples_per_client=spc,
                                   seed=0)
    engine = FederatedRoundEngine(
        create_model("simple_cnn", dtype=jnp.float32), arrays,
        RoundEngineConfig(
            training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
            aggregation="median", max_clients=clients, seed=0),
        mesh=mesh8)
    args = (
        engine.global_variables,
        jnp.asarray(0, jnp.int32),
        jnp.ones((clients,), jnp.float32),
        jnp.asarray(np.asarray(engine.epochs_per_client)),
        engine.data.images,
        engine.data.labels,
        engine.data.num_samples,
        engine.uplink_error,
    )
    hlo = engine._superstep.lower(*args).compile().as_text()
    kinds = {c.kind for c in collective_inventory(hlo)}
    assert "all-gather" in kinds or "all-to-all" in kinds, (
        "median aggregation should show the inherent gather of stacked "
        f"deltas; saw {kinds}")
