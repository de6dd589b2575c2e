#!/usr/bin/env python
"""Adversarial-robustness evidence: measured attack/defense matrix.

Runs both poisoning attacks (untargeted label flip + targeted pixel
backdoor, each with a 50× count lie) against every aggregation rule
through the production engine, and writes
docs/adversarial_evaluation.json. Companion to scripts/inversion_demo.py
(privacy side) — together they make the framework's security claims
machine-readable measurements instead of citations.

Usage: python scripts/adversarial_eval.py [--rounds 5] [--clients 8]
"""

import argparse
import json
import pathlib
import time

import numpy as np

from fl_tpu.data.federated import FederatedArrays
from fl_tpu.data.synthetic import synthetic_mnist
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models.base import FLModel
from fl_tpu.validation.poisoning import (
    evaluate_backdoor_robustness,
    evaluate_poisoning_robustness,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--attackers", type=int, nargs="+", default=[1, 5])
    ap.add_argument("--inflate", type=float, default=50.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data-seed", type=int, default=21,
                    help="synthetic population seed (vary alongside "
                         "--seed when sweeping for variance)")
    ap.add_argument("--out", default="docs/adversarial_evaluation.json")
    args = ap.parse_args()

    import flax.linen as nn

    class TinyMLP(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool = False):
            x = x.reshape((x.shape[0], -1))
            x = nn.relu(nn.Dense(32, name="fc1")(x))
            return nn.Dense(10, name="fc2")(x)

    def model_fn():
        return FLModel(module=TinyMLP(), name="tiny_mlp",
                       input_shape=(28, 28, 1), num_classes=10)

    C, n = args.clients, args.samples
    xtr, ytr, xte, yte = synthetic_mnist(n_train=C * n, n_test=512,
                                         seed=args.data_seed)
    data = FederatedArrays(
        images=xtr.reshape(C, n, 28, 28, 1),
        labels=ytr.reshape(C, n).astype(np.int32),
        num_samples=np.full(C, n, np.int32),
        mean=np.asarray([0.1307], np.float32),
        std=np.asarray([0.3081], np.float32), num_classes=10)
    training = FederatedTrainingConfig(
        local_epochs=3, batch_size=16, learning_rate=0.05,
        optimizer_type="sgd")

    t0 = time.time()
    flip = evaluate_poisoning_robustness(
        model_fn, data, xte, yte, attacker_ids=args.attackers,
        training=training, num_rounds=args.rounds,
        inflate_samples=args.inflate, seed=args.seed)
    backdoor = evaluate_backdoor_robustness(
        model_fn, data, xte, yte, attacker_ids=args.attackers,
        training=training, num_rounds=args.rounds,
        inflate_samples=args.inflate, seed=args.seed)

    print(f"label flip: clean_fedavg={flip['clean_fedavg']:.3f} "
          f"poisoned={ {k: round(v, 3) for k, v in flip['poisoned'].items()} }")
    for agg, r in backdoor["results"].items():
        print(f"backdoor {agg}: clean={r['clean_accuracy']:.3f} "
              f"ASR={r['backdoor_success_rate']:.3f}")

    out = {
        "description": (
            "Attack/defense matrix through the production engine: "
            "untargeted label flipping and a targeted pixel-trigger "
            "backdoor, both with inflated client-reported sample "
            "counts. Synthetic MNIST; defenses are the engine's "
            "aggregation rules."),
        "config": {"clients": C, "samples_per_client": n,
                   "attackers": list(args.attackers),
                   "inflate_samples": args.inflate,
                   "rounds": args.rounds, "seed": args.seed,
                   "data_seed": args.data_seed},
        "platform": __import__("jax").devices()[0].platform,
        "label_flip": flip,
        "backdoor": backdoor,
        "wall_s": round(time.time() - t0, 1),
    }
    path = pathlib.Path(args.out)
    path.write_text(json.dumps(out, indent=2, default=float))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
