#!/usr/bin/env python
"""One-run privacy audit headline: measured ε lower bound vs certified ε.

Runs the update-canary client-level membership audit
(fl_tpu.validation.audit; Steinke, Nasr & Jagielski 2023) against the
production client_dp superstep and writes a JSON artifact.

The reference has no empirical privacy validation at all (its strongest
check is the noise-σ band, src/validation/privacy_validator.py:104-108);
this script produces the two-sided privacy statement the framework ships:
certified ε from the RDP accountant above, audited ε from a real attack
below, with the gap quantifying the accountant's conservatism.

Usage (CPU is fine — the audit is mechanism-bound, not compute-bound):
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/audit_privacy.py \
      --clients 16 --canaries 48 --rounds 8 --noise-multiplier 1.0
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--canaries", type=int, default=48)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--noise-multiplier", type=float, default=1.0)
    ap.add_argument("--participation", type=float, default=1.0)
    ap.add_argument("--clip", type=float, default=1.0)
    ap.add_argument("--guess-fraction", type=float, default=0.25)
    ap.add_argument("--confidence", type=float, default=0.95)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--samples-per-client", type=int, default=16)
    ap.add_argument("--out", type=str, default="docs/privacy_audit.json")
    args = ap.parse_args()

    from fl_tpu.core.types import PrivacyConfig
    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import RoundEngineConfig
    from fl_tpu.validation.audit import run_client_membership_audit

    mnist = load_dataset("mnist", n_train_synth=4096, n_test_synth=256)
    fa = make_federated_arrays(
        mnist, num_clients=args.clients, strategy="iid",
        samples_per_client=args.samples_per_client, seed=args.seed)
    model = create_model("simple_cnn")
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=1, batch_size=16),
        dp_mode="client_dp",
        privacy=PrivacyConfig(
            epsilon=1e9, delta=1e-5, max_grad_norm=args.clip,
            noise_multiplier=args.noise_multiplier),
        participation_rate=args.participation,
        seed=args.seed)

    t0 = time.time()
    out = run_client_membership_audit(
        model, fa, cfg, num_canaries=args.canaries, num_rounds=args.rounds,
        guess_fraction=args.guess_fraction, confidence=args.confidence,
        seed=args.seed)
    out["wall_time_s"] = round(time.time() - t0, 1)
    out["config"] = {
        "clients": args.clients, "canaries": args.canaries,
        "rounds": args.rounds, "noise_multiplier": args.noise_multiplier,
        "participation": args.participation, "clip": args.clip,
        "model": "simple_cnn", "dataset": "mnist (synthetic fallback ok)",
    }
    out.pop("scores", None)
    out.pop("included", None)

    path = Path(args.out)
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps({
        "empirical_epsilon_lower_bound":
            out["empirical_epsilon_lower_bound"],
        "certified_epsilon": out["certified_epsilon"],
        "consistent": out["consistent"],
        "correct_guesses": f"{out['num_correct']}/{out['num_guesses']}",
        "wall_time_s": out["wall_time_s"],
        "artifact": str(path),
    }))


if __name__ == "__main__":
    main()
