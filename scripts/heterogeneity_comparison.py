#!/usr/bin/env python
"""Measured comparison of the heterogeneity-correction family.

Runs FedAvg, FedProx, SCAFFOLD, FedNova, and FedAdam on the SAME
pathological non-IID synthetic-MNIST population with heterogeneous
per-client epoch budgets (the capability-adaptation regime), and writes
docs/heterogeneity_comparison.json with per-round test accuracy — so the
"corrects client drift" claims ship with numbers instead of citations.

All five run through the production FederatedRoundEngine; only the knob
under study changes. SGD local steps everywhere (SCAFFOLD/FedNova
require it), same seed, same budgets, same data.

Usage: python scripts/heterogeneity_comparison.py [--rounds 20]
       [--clients 16] [--samples 128] [--out docs/...json]
"""

import argparse
import json
import pathlib
import time

import numpy as np

from fl_tpu.data import create_data_loader, make_federated_arrays
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models import get_model_for_dataset
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=20)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--samples", type=int, default=128,
                    help="samples per client")
    ap.add_argument("--local-epochs", type=int, default=8,
                    help="max epoch budget (heterogeneous cycle tops here)")
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--partition", default="non_iid",
                    choices=["iid", "non_iid", "pathological"])
    ap.add_argument("--out", default="docs/heterogeneity_comparison.json")
    args = ap.parse_args()

    C = args.clients
    loader = create_data_loader(
        "mnist", num_clients=C, partition_strategy=args.partition,
        n_train_synth=C * args.samples, n_test_synth=1024)
    arrays = make_federated_arrays(
        loader.splits, C, args.partition,
        samples_per_client=args.samples, seed=args.seed)
    xte, yte = loader.get_test_set()
    # LOW/MEDIUM/HIGH capability budgets, cycled (ref table:
    # src/shared/training.py:455-502 → 3/5/10; capped by --local-epochs)
    budgets = np.asarray(
        [[2, args.local_epochs // 2, args.local_epochs][i % 3]
         for i in range(C)], np.int32)

    def train_cfg(**kw):
        # plain SGD everywhere: SCAFFOLD's Option II identity requires
        # momentum 0, and a fair comparison holds the local optimizer
        # fixed across variants
        return FederatedTrainingConfig(
            local_epochs=args.local_epochs, batch_size=16,
            learning_rate=args.lr, optimizer_type="sgd", momentum=0.0,
            **kw)

    variants = {
        "fedavg": RoundEngineConfig(training=train_cfg(), seed=args.seed),
        "fedprox": RoundEngineConfig(
            training=train_cfg(proximal_mu=0.1), seed=args.seed),
        "scaffold": RoundEngineConfig(
            training=train_cfg(), scaffold=True, seed=args.seed),
        "fednova": RoundEngineConfig(
            training=train_cfg(), fednova=True, seed=args.seed),
        "feddyn": RoundEngineConfig(
            training=train_cfg(), feddyn_alpha=0.1, seed=args.seed),
        "fedadam": RoundEngineConfig(
            training=train_cfg(), server_optimizer="fedadam",
            server_lr=0.01, seed=args.seed),
    }

    results = {}
    for name, cfg in variants.items():
        eng = FederatedRoundEngine(
            get_model_for_dataset("mnist"), arrays, cfg,
            test_images=xte, test_labels=yte)
        eng.epochs_per_client = budgets
        t0 = time.time()
        hist = eng.run(args.rounds, evaluate_every=1)
        accs = [r.test_accuracy for r in hist]
        results[name] = {
            "test_accuracy": accs,
            "final": accs[-1],
            "best": max(accs),
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"{name:9s} final={accs[-1]:.4f} best={max(accs):.4f} "
              f"({results[name]['wall_s']}s)")

    out = {
        "description": (
            "Heterogeneity-correction family on pathological non-IID "
            "synthetic MNIST with heterogeneous per-client epoch budgets "
            "(cycled LOW/MED/HIGH). Same engine, data, budgets, seed; "
            "only the algorithm knob changes."),
        "config": {
            "clients": C, "samples_per_client": args.samples,
            "rounds": args.rounds, "budgets": budgets.tolist(),
            "lr": args.lr, "seed": args.seed,
            "partition": "pathological",
        },
        "platform": __import__("jax").devices()[0].platform,
        "results": results,
    }
    path = pathlib.Path(args.out)
    path.write_text(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
