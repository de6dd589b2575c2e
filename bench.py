"""Benchmark: DP-FedAvg round throughput at 512 simulated MNIST clients.

Workload (BASELINE.json north star): 512 clients, SimpleCNN (~422K params),
5 local epochs × batch 32 over 64-sample shards, reference-mode DP (delta
clip + Gaussian noise), sample-weighted FedAvg — all as one jitted superstep
on the available accelerator (single TPU v5e chip here; the same program
shards over a mesh via fl_tpu.core.mesh on a slice).

Reference point: the reference's simulation runs each client as a thread
with a full torch train loop + gRPC round trip; its round latency at 5-50
clients is tens of seconds and it cannot reach 512 clients at all. The
north-star target is 50 rounds/sec on a v5e-8 POD SLICE; this single-chip
bench reports vs_baseline as the fraction of that 50 rounds/sec target
(1.0 = north star met on one chip).

Prints exactly ONE JSON line on stdout.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compile cache: the axon remote compile of the superstep takes
# minutes; cache hits bring reruns to seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

NUM_CLIENTS = int(os.environ.get("BENCH_CLIENTS", "512"))
SAMPLES_PER_CLIENT = 64
LOCAL_EPOCHS = 5
BATCH_SIZE = 32
TIMED_ROUNDS = 20
TARGET_ROUNDS_PER_SEC = 50.0  # north-star on v5e-8


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mesh", type=int, default=0, metavar="N",
                   help="shard the client axis over an N-device mesh (the "
                        "north-star v5e-8 configuration). With fewer than N "
                        "real devices the bench re-runs itself on an "
                        "N-device virtual CPU mesh (slow, but the exact "
                        "program a slice would run).")
    p.add_argument("--rounds", type=int, default=TIMED_ROUNDS)
    p.add_argument("--no-reexec", action="store_true", help=argparse.SUPPRESS)
    return p.parse_args()


def main() -> None:
    args = parse_args()

    if not args.mesh and not args.no_reexec:
        # Guard against a wedged accelerator backend (the axon relay can
        # hang PJRT init indefinitely when the tunnel is down): probe
        # device init in a THROWAWAY subprocess with a hard timeout, and
        # fail with ONE honest JSON line instead of hanging the driver.
        # (--mesh runs skip this: their own probe below already has a
        # timeout and falls back to the virtual CPU mesh, which needs no
        # accelerator at all.)
        import subprocess

        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=600, capture_output=True,
            )
            backend_ok = probe.returncode == 0
        except subprocess.TimeoutExpired:
            backend_ok = False
        if not backend_ok:
            print("accelerator backend failed to initialize within 600s "
                  "(axon relay down?)", file=sys.stderr)
            print(json.dumps({
                "metric": (f"dp_fedavg_rounds_per_sec_{NUM_CLIENTS}"
                           "clients_mnist_v5e1"),
                "value": 0.0,
                "unit": "rounds/sec",
                "vs_baseline": 0.0,
                "error": "accelerator backend unavailable "
                         "(PJRT init timed out; environmental)",
            }))
            sys.exit(1)

    if args.mesh and not args.no_reexec:
        # Probe the device count in a THROWAWAY subprocess: importing jax
        # here would initialize (and hold) the axon TPU backend in this
        # parent for the whole child run, serializing any other TPU user.
        # A hung init (wedged relay) counts as "not enough devices" and
        # takes the CPU-virtual-mesh fallback below.
        import subprocess

        try:
            probe_rc = subprocess.run(
                [sys.executable, "-c",
                 "import jax, sys; "
                 f"sys.exit(0 if len(jax.devices()) >= {args.mesh} else 1)"],
                timeout=600,
            ).returncode
        except subprocess.TimeoutExpired:
            probe_rc = 1
        if probe_rc != 0:
            # single-chip environment: rerun on a virtual CPU mesh (same
            # program, same shardings a real slice would execute)
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["PALLAS_AXON_POOL_IPS"] = ""  # axon overrides JAX_PLATFORMS
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={args.mesh}"
            ).strip()
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--mesh", str(args.mesh), "--rounds", str(args.rounds),
                 "--no-reexec"],
                env=env, timeout=3600,
            )
            sys.exit(proc.returncode)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, not a requirement
        print(f"compile cache unavailable: {e}", file=sys.stderr)

    from fl_tpu.core.types import PrivacyConfig
    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

    print(f"devices: {jax.devices()}", file=sys.stderr)

    import jax.numpy as jnp

    splits = load_dataset(
        "mnist",
        n_train_synth=NUM_CLIENTS * SAMPLES_PER_CLIENT,
        n_test_synth=1024,
    )
    arrays = make_federated_arrays(
        splits, num_clients=NUM_CLIENTS, strategy="iid",
        samples_per_client=SAMPLES_PER_CLIENT, seed=0,
    )
    mesh = None
    if args.mesh:
        from fl_tpu.core.mesh import make_mesh

        mesh = make_mesh(args.mesh)
        print(f"mesh: {args.mesh} devices, client axis sharded",
              file=sys.stderr)

    # bf16 compute (params stay f32): the MXU-native dtype, ~1.3x round
    # throughput at equal accuracy on this workload.
    # BENCH_MODEL_KWARGS (JSON) toggles formulation flags for A/B runs,
    # e.g. '{"fast_stem_wgrad": true}'.
    # fused_conv_block="residual" (round 5): the packed-K fused Pallas
    # conv segment with the pool2 routing-index residual — measured
    # 2.39 vs 1.79 rounds/s same-session A/B (docs/performance.md).
    extra = json.loads(os.environ.get(
        "BENCH_MODEL_KWARGS", '{"fused_conv_block": "residual"}'))
    model = create_model("simple_cnn", dtype=jnp.bfloat16, **extra)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(
            local_epochs=LOCAL_EPOCHS, batch_size=BATCH_SIZE,
            learning_rate=0.001, optimizer_type="adam",
            # bf16-stored Adam moments halve the per-client m/v HBM
            # traffic of the wgrad+Adam fusions (the profiled fc1 fusion
            # runs at ~80% of HBM peak); moment arithmetic stays f32.
            # BENCH_OPT_STATE_DTYPE= (empty) reverts for A/B runs.
            optimizer_state_dtype=os.environ.get(
                "BENCH_OPT_STATE_DTYPE", "bfloat16") or None,
            # bf16-stored per-client params with unbiased stochastic
            # rounding (fl_tpu.ops.rounding) halve the param-tree HBM
            # traffic of fwd/dgrad/Adam. BENCH_PARAM_DTYPE= reverts.
            param_storage_dtype=os.environ.get(
                "BENCH_PARAM_DTYPE", "") or None,
        ),
        dp_mode="delta",
        privacy=PrivacyConfig(epsilon=1.0, delta=1e-5, max_grad_norm=1.0),
        epsilon_per_round=1.0 / (args.rounds + 8),
        delta_per_round=1e-5 / (args.rounds + 8),
        max_clients=NUM_CLIENTS,
        seed=0,
    )
    engine = FederatedRoundEngine(model, arrays, cfg, mesh=mesh)

    t0 = time.perf_counter()
    engine.run_round(evaluate=False)  # compile + warmup
    compile_s = time.perf_counter() - t0
    print(f"warmup (incl. compile): {compile_s:.1f}s", file=sys.stderr)

    # sequential dispatch measures ~2x faster than the fused lax.scan at
    # this round granularity (828 vs 1687 ms/round — docs/performance.md);
    # run_rounds_fused exists for dispatch-bound (tiny-round) scales.
    # Depth-1 dispatch pipelining overlaps the host control plane (the
    # metrics-readback RTTs through the remote-TPU transport, privacy
    # accounting, convergence bookkeeping) with device compute — same
    # per-round program and semantics as a run_round loop.
    t0 = time.perf_counter()
    if os.environ.get("BENCH_NO_PIPELINE") == "1":  # A/B diagnostics
        for _ in range(args.rounds):
            engine.run_round(evaluate=False)
    else:
        engine.run_rounds_pipelined(args.rounds, evaluate=False)
    # the last round's finalize blocks on its metrics readback, so timing
    # is sync'd
    dt = time.perf_counter() - t0
    rounds_per_sec = args.rounds / dt
    client_rounds_per_sec = rounds_per_sec * NUM_CLIENTS

    print(
        f"{args.rounds} rounds in {dt:.2f}s -> {rounds_per_sec:.2f} rounds/s "
        f"({client_rounds_per_sec:.0f} client-rounds/s)",
        file=sys.stderr,
    )

    suffix = f"mesh{args.mesh}" if args.mesh else "v5e1"
    print(json.dumps({
        "metric": (f"dp_fedavg_rounds_per_sec_{NUM_CLIENTS}clients_"
                   f"mnist_{suffix}"),
        "value": round(rounds_per_sec, 3),
        "unit": "rounds/sec",
        "vs_baseline": round(rounds_per_sec / TARGET_ROUNDS_PER_SEC, 4),
        # VERDICT r3 #3: track compile/warmup cost every bench run. On a
        # warm persistent cache (JAX_COMPILATION_CACHE_DIR) this should be
        # seconds; minutes means the cache missed (axon remote compile).
        "warmup_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
