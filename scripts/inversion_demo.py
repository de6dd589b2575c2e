#!/usr/bin/env python
"""Gradient-inversion headline: what one released update leaks, with and
without DP.

Runs the DLG/iDLG-style attack (fl_tpu.validation.inversion) against a
single client's single-step release of SimpleCNN on synthetic MNIST at
batch sizes 1 and 4, non-private vs the reference-semantics DP release at
ε=1.0, and writes docs/inversion_report.json. The attack itself is one
jitted XLA program (scan of signed-Adam steps, vmapped restarts).

Usage: python scripts/inversion_demo.py [--steps 2000] [--restarts 4]
"""

import argparse
import json
import pathlib
import time

import jax
import numpy as np

from fl_tpu.data.synthetic import synthetic_mnist
from fl_tpu.models.factory import ModelFactory
from fl_tpu.validation.inversion import InversionAttackConfig, inversion_report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--restarts", type=int, default=4)
    ap.add_argument("--epsilon", type=float, default=1.0)
    ap.add_argument("--out", default="docs/inversion_report.json")
    args = ap.parse_args()

    model = ModelFactory.create_model("simple_cnn")
    variables = model.init(jax.random.PRNGKey(0))
    xtr, ytr, _, _ = synthetic_mnist(n_train=16, n_test=1, seed=3)
    cfg = InversionAttackConfig(steps=args.steps, restarts=args.restarts)

    results = {}
    for batch in (1, 4):
        t0 = time.time()
        rep = inversion_report(
            model, variables, xtr[:batch], ytr[:batch], 0.1307, 0.3081,
            epsilon=args.epsilon, delta=1e-5, max_norm=1.0,
            attack_config=cfg, seed=0)
        rep["wall_s"] = round(time.time() - t0, 1)
        results[f"batch_{batch}"] = rep
        print(f"batch={batch}: non-private "
              f"{rep['non_private']['psnr_db']:.1f} dB "
              f"(labels {rep['non_private']['label_accuracy']:.0%}) vs DP "
              f"{rep['dp']['psnr_db']:.1f} dB "
              f"(labels {rep['dp']['label_accuracy']:.0%}) — "
              f"gap {rep['psnr_gap_db']:.1f} dB [{rep['wall_s']}s]")

    out = {
        "description": (
            "DLG/iDLG gradient-inversion attack vs this framework's "
            "release path: single-step SGD delta of SimpleCNN on "
            "synthetic MNIST, attacker knows lr/preprocessing. "
            "PSNR of best-of-restarts reconstruction vs the true batch."),
        "attack": {"steps": args.steps, "restarts": args.restarts,
                   "matching": cfg.matching,
                   "learning_rate": cfg.learning_rate},
        "dp_release": {"epsilon": args.epsilon, "delta": 1e-5,
                       "max_norm": 1.0, "mode": "delta (reference semantics)"},
        "platform": jax.devices()[0].platform,
        "results": results,
    }
    path = pathlib.Path(args.out)
    path.write_text(json.dumps(out, indent=2, default=float))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
