"""Weak-scaling curve for the mesh-sharded round engine (VERDICT r2 #2).

Fixed clients-per-device, growing device count: ideal weak scaling keeps
time-per-round constant because FedAvg over the client axis is
embarrassingly parallel — the only collective is the sample-weighted
`psum` of the (C, D) update matrix at the end of the round
(fl_tpu/orchestration/round_engine.py, shard_map over the `clients` axis).

Measured on the virtual CPU mesh (`--xla_force_host_platform_device_count`)
with f32 + tiny shapes: bf16 on CPU is pathologically slow and compile
time explodes at bench shapes (see docs/performance.md "Environment
facts"), but the PROGRAM — shardings, collective schedule — is exactly
what a real v5e slice would execute, so the parallel fraction it measures
is the honest basis for the multi-chip projection.

Each device count runs in a fresh subprocess (platform forcing must
happen before jax initializes; the axon sitecustomize wins otherwise).

Usage: python scripts/weak_scaling.py [--out docs/weak_scaling_cpu.json]
Reference analog: the reference's only scaling evidence is the 5->50
client ramp in src/validation/performance_validator.py:95-102 (threaded
torch clients, seconds per round).
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CLIENTS_PER_DEVICE = 8
SAMPLES_PER_CLIENT = 32
LOCAL_EPOCHS = 1
BATCH_SIZE = 16
TIMED_ROUNDS = 10


def run_one(n_devices: int) -> dict:
    """One weak-scaling point, in a platform-forced child process."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # axon overrides JAX_PLATFORMS alone
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    env["WS_DEVICES"] = str(n_devices)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child"],
        env=env, capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"child for {n_devices} devices failed:\n{proc.stderr[-2000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def child() -> None:
    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp

    from fl_tpu.core.mesh import make_mesh
    from fl_tpu.core.types import PrivacyConfig
    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

    n_devices = int(os.environ["WS_DEVICES"])
    assert len(jax.devices()) >= n_devices, jax.devices()
    num_clients = CLIENTS_PER_DEVICE * n_devices

    splits = load_dataset(
        "mnist",
        n_train_synth=num_clients * SAMPLES_PER_CLIENT,
        n_test_synth=256,
    )
    arrays = make_federated_arrays(
        splits, num_clients=num_clients, strategy="iid",
        samples_per_client=SAMPLES_PER_CLIENT, seed=0,
    )
    mesh = make_mesh(n_devices) if n_devices > 1 else None
    model = create_model("simple_cnn", dtype=jnp.float32)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(
            local_epochs=LOCAL_EPOCHS, batch_size=BATCH_SIZE,
            learning_rate=0.001, optimizer_type="adam",
        ),
        dp_mode="delta",
        privacy=PrivacyConfig(epsilon=1.0, delta=1e-5, max_grad_norm=1.0),
        epsilon_per_round=1.0 / (TIMED_ROUNDS + 4),
        delta_per_round=1e-5 / (TIMED_ROUNDS + 4),
        max_clients=num_clients,
        seed=0,
    )
    engine = FederatedRoundEngine(model, arrays, cfg, mesh=mesh)

    t0 = time.perf_counter()
    engine.run_round(evaluate=False)  # compile + warmup
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(TIMED_ROUNDS):
        engine.run_round(evaluate=False)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "devices": n_devices,
        "clients": num_clients,
        "rounds": TIMED_ROUNDS,
        "ms_per_round": round(dt / TIMED_ROUNDS * 1000, 2),
        "rounds_per_sec": round(TIMED_ROUNDS / dt, 3),
        "client_rounds_per_sec": round(TIMED_ROUNDS / dt * num_clients, 1),
        "compile_s": round(compile_s, 1),
    }))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--out", default=os.path.join(
        REPO, "docs", "weak_scaling_cpu.json"))
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    args = p.parse_args()
    if args.child:
        child()
        return

    points = []
    for n in args.devices:
        pt = run_one(n)
        points.append(pt)
        print(f"  {pt}", file=sys.stderr)

    base = points[0]["ms_per_round"]
    for pt in points:
        # weak scaling: ideal keeps ms/round flat as devices (and total
        # clients) grow together
        pt["weak_scaling_efficiency"] = round(base / pt["ms_per_round"], 3)

    result = {
        "workload": {
            "clients_per_device": CLIENTS_PER_DEVICE,
            "samples_per_client": SAMPLES_PER_CLIENT,
            "local_epochs": LOCAL_EPOCHS,
            "batch_size": BATCH_SIZE,
            "dtype": "float32",
            "dp_mode": "delta",
            "platform": "cpu virtual mesh "
                        "(--xla_force_host_platform_device_count)",
        },
        "points": points,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
