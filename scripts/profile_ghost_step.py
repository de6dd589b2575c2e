"""Profile the ghost DP-SGD round on the TPU (VERDICT r2 #6).

The ghost-norm DP-SGD headline runs ~6.5 s/round at 128 clients x 32
steps x batch 256, ~4.3x a plain step where the formulation predicts
2-3x (1 fwd + 2 bwd + norm GEMMs). This captures an xplane trace of the
dp_sgd/ghost superstep at a reduced client count (same per-client shapes,
so the op mix is identical; host->device upload through the axon relay
caps the practical dataset size) and prints the top ops by self time.

Usage: python scripts/profile_ghost_step.py [--clients 32] [--impl ghost]
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from fl_tpu.core.types import PrivacyConfig
from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl.accounting import calibrate_noise_multiplier
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models import create_model
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

TRACE_DIR = "/tmp/fl_tpu_ghost_trace"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clients", type=int, default=32)
    p.add_argument("--samples-per-client", type=int, default=2048)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--impl", default="ghost",
                   choices=["ghost", "microbatch", "plain"])
    p.add_argument("--no-stem-wgrad", action="store_true",
                   help="A/B: disable the tap-GEMM stem wgrad (it wins on "
                        "the plain bench but may lose inside the ghost "
                        "program's different layout environment)")
    args = p.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    splits = load_dataset(
        "mnist", n_train_synth=args.clients * args.samples_per_client,
        n_test_synth=1024)
    arrays = make_federated_arrays(
        splits, num_clients=args.clients, strategy="iid",
        samples_per_client=args.samples_per_client, seed=0)
    z = calibrate_noise_multiplier(
        1.0, 1e-5, args.batch / args.samples_per_client, 30 * 8)
    dp = {} if args.impl == "plain" else dict(
        dp_mode="dp_sgd",
        privacy=PrivacyConfig(epsilon=1.0, delta=1e-5, max_grad_norm=1.0,
                              noise_multiplier=z),
        dp_microbatch=8, dp_sgd_impl=args.impl)
    engine = FederatedRoundEngine(
        create_model("simple_cnn", dtype=jnp.bfloat16,
                     fast_stem_wgrad=not args.no_stem_wgrad), arrays,
        RoundEngineConfig(
            training=FederatedTrainingConfig(
                local_epochs=1, batch_size=args.batch, learning_rate=0.1,
                optimizer_type="sgd"),
            max_clients=args.clients, seed=0, **dp),
    )
    engine.run_round(evaluate=False)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(3):
        engine.run_round(evaluate=False)
    per_round = (time.perf_counter() - t0) / 3
    print(f"steady-state: {per_round * 1e3:.0f} ms/round "
          f"({args.impl}, {args.clients} clients, "
          f"{args.samples_per_client // args.batch} steps/round)", flush=True)

    import shutil

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    result = engine.profile_round(TRACE_DIR)
    print(f"profiled round: {result.round_time_s * 1e3:.1f} ms", flush=True)

    xplanes = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    if not xplanes:
        print("no xplane captured", flush=True)
        return
    from xprof.convert import raw_to_tool_data

    for tool in ("framework_op_stats", "hlo_stats"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                xplanes, tool, {"tqx": "out:csv;"})
            out = f"/tmp/fl_tpu_ghost_{tool}.csv"
            with open(out, "wb" if isinstance(data, bytes) else "w") as f:
                f.write(data)
            print(f"wrote {out}", flush=True)
        except Exception as e:
            print(f"{tool} failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
