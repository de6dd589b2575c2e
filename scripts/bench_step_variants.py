"""Measure bench-round throughput across superstep variants.

Isolates the contributions found in the xplane profile
(scripts/profile_bench_round.py): fast_ops model formulations (patchT stem
conv + reshape maxpool) and the optimizer (adam's fc1 m/v streaming).

Usage: BENCH_VARIANTS=fast_adam,base_sgd,fast_sgd python scripts/bench_step_variants.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _bench_util  # noqa: F401  (compile cache + path setup)
import jax

import jax.numpy as jnp

from fl_tpu.core.types import PrivacyConfig
from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models import create_model
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

ROUNDS = 10


def run_variant(name, fast_ops, optimizer, arrays):
    model = create_model("simple_cnn", dtype=jnp.bfloat16, fast_ops=fast_ops)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=5, batch_size=32,
                                         learning_rate=0.001,
                                         optimizer_type=optimizer),
        dp_mode="delta",
        privacy=PrivacyConfig(epsilon=10.0, delta=1e-4, max_grad_norm=1.0),
        epsilon_per_round=0.05, delta_per_round=1e-7,
        max_clients=512, seed=0,
    )
    engine = FederatedRoundEngine(model, arrays, cfg)
    t0 = time.perf_counter()
    engine.run_round(evaluate=False)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        engine.run_round(evaluate=False)
    dt = time.perf_counter() - t0
    print(f"{name:12s}: {ROUNDS / dt:5.2f} rounds/s "
          f"({dt / ROUNDS * 1e3:6.1f} ms/round, compile {compile_s:.0f}s)",
          flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    splits = load_dataset("mnist", n_train_synth=512 * 64, n_test_synth=1024)
    arrays = make_federated_arrays(splits, num_clients=512, strategy="iid",
                                   samples_per_client=64, seed=0)
    which = os.environ.get("BENCH_VARIANTS",
                           "fast_adam,base_sgd,fast_sgd").split(",")
    table = {
        "base_adam": (False, "adam"),
        "fast_adam": (True, "adam"),
        "base_sgd": (False, "sgd"),
        "fast_sgd": (True, "sgd"),
    }
    for name in which:
        fast, opt = table[name.strip()]
        try:
            run_variant(name.strip(), fast, opt, arrays)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
