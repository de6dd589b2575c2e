"""Profile one bench-shaped round on the TPU and dump the op-level breakdown.

Captures a jax.profiler trace of the 512-client superstep and converts the
xplane with xprof's tooling into a framework_op_stats table, printing the
top ops by self time — the ground truth for where the 85 ms/step goes
(docs/performance.md's decomposition was inferred from variant timing).
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from fl_tpu.core.types import PrivacyConfig
from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models import create_model
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

TRACE_DIR = "/tmp/fl_tpu_trace"


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--mesh", type=int, default=0,
                   help="profile the GSPMD mesh program over N devices "
                        "(N=1 isolates mesh-program overhead on one chip)")
    p.add_argument("--pallas-dp", default=None,
                   choices=["on", "off"],
                   help="override use_pallas_dp (default: engine auto)")
    args = p.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    splits = load_dataset("mnist", n_train_synth=512 * 64, n_test_synth=1024)
    arrays = make_federated_arrays(splits, num_clients=512, strategy="iid",
                                   samples_per_client=64, seed=0)
    import json as _json

    extra = _json.loads(os.environ.get("BENCH_MODEL_KWARGS", "{}"))
    model = create_model("simple_cnn", dtype=jnp.bfloat16, **extra)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=5, batch_size=32,
                                         learning_rate=0.001,
                                         optimizer_type="adam",
                                         optimizer_state_dtype="bfloat16"),
        dp_mode="delta",
        privacy=PrivacyConfig(epsilon=1.0, delta=1e-5, max_grad_norm=1.0),
        epsilon_per_round=0.02, delta_per_round=1e-7,
        max_clients=512, seed=0,
        use_pallas_dp=(None if args.pallas_dp is None
                       else args.pallas_dp == "on"),
    )
    mesh = None
    if args.mesh:
        from fl_tpu.core.mesh import make_mesh

        mesh = make_mesh(args.mesh)
    engine = FederatedRoundEngine(model, arrays, cfg, mesh=mesh)
    engine.run_round(evaluate=False)  # compile + warmup
    engine.run_round(evaluate=False)
    import shutil

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    result = engine.profile_round(TRACE_DIR)
    print(f"profiled round: {result.round_time_s * 1e3:.1f} ms", flush=True)

    xplanes = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        return
    # the tensorboard_plugin_profile converter broke against this env's
    # protobuf/TF versions; the standalone xprof package works
    from xprof.convert import raw_to_tool_data

    for tool in ("framework_op_stats", "hlo_stats"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                xplanes, tool, {"tqx": "out:csv;"})
            out = f"/tmp/fl_tpu_{tool}.csv"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print(f"wrote {out}", flush=True)
        except Exception as e:
            print(f"{tool} failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
