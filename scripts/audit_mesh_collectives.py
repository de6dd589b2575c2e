"""Audit the mesh superstep's collective schedule from compiled HLO.

The multi-chip projection (docs/performance.md "Weak scaling") rests on
the claim that the client-sharded round program is embarrassingly
parallel: local training partitions cleanly over the client axis and the
ONLY cross-device communication is the FedAvg reduction of the weighted
update (D model floats) plus scalar metric reductions. Rather than
asserting that, this compiles the real superstep over an 8-device
virtual mesh and counts/sizes every collective op in the optimized HLO.

Collective structure is shape-independent, so tiny client/sample counts
keep CPU compile fast while auditing the exact program a slice runs.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/audit_mesh_collectives.py
"""

import os

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fl_tpu.core.mesh import make_mesh
from fl_tpu.core.types import PrivacyConfig
from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models import create_model
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

# shared with the always-on CI audit (tests/test_collective_audit.py)
from fl_tpu.parallel.hlo_audit import collective_inventory  # noqa: E402


def main():
    n_dev = 8
    assert len(jax.devices()) >= n_dev, jax.devices()
    clients, spc = 16, 16
    splits = load_dataset("mnist", n_train_synth=clients * spc,
                          n_test_synth=64)
    arrays = make_federated_arrays(splits, num_clients=clients,
                                   strategy="iid",
                                   samples_per_client=spc, seed=0)
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
        mesh=make_mesh(n_dev))

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
    print(f"collectives in optimized HLO ({n_dev}-device mesh, "
          f"{clients} clients):")
    total = 0
    for kind, out_type, nbytes in found:
        print(f"  {kind:20s} {out_type:30s} {nbytes} B")
        total += nbytes
    print(f"total collective payload: {total} B "
          f"({len(found)} ops)")
    # model has ~422K params -> at bench scale the big all-reduce is
    # D*4 B ~ 1.7 MB; everything else must be scalar-ish metrics
    big = [f for f in found if f[2] > 64]
    print(f"non-scalar collectives: {len(big)}")


if __name__ == "__main__":
    main()
