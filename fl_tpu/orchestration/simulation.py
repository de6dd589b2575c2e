"""End-to-end federated simulation harness.

Parity target: src/simulation/federated_simulation.py — SimulationConfig
(:29-83: 5 clients, 10 rounds, target accuracy 0.91, ε=1.0),
SimulatedClient (:85-192), FederatedLearningSimulation (:194-528) and the
run_mnist_simulation / run_cifar10_simulation entries (:530-599).

Two backends:

- ``onchip`` (default, the TPU-native design): all simulated clients run as
  ONE batched XLA program via FederatedRoundEngine — no gRPC, no
  serialization; heterogeneity (the reference cycles LOW/MED/HIGH power and
  5/10/25/50 Mbps profiles, ref :247-249) maps to per-client epoch budgets
  inside the vmapped program; stragglers/failures are participation-mask
  dropout.
- ``grpc``: reference-parity integration mode — an in-process coordinator
  (gRPC servicer) plus N FederatedTrainer client threads over localhost,
  exactly the reference's topology (ref :309-318), for validating the
  deployment stack.

Exit criteria match the reference (:362-428): target accuracy reached |
round budget exhausted | wall-clock timeout.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import logging
import time
from typing import Any, Dict, List, Optional

import numpy as np

from fl_tpu.core.types import ComputePowerLevel, PrivacyConfig
from fl_tpu.fl.local_training import FederatedTrainingConfig, create_adaptive_config
from fl_tpu.models import get_model_for_dataset
from fl_tpu.orchestration.metrics import MetricsCollector
from fl_tpu.orchestration.round_engine import (
    FederatedRoundEngine,
    RoundEngineConfig,
)

logger = logging.getLogger(__name__)

# capability profiles cycled over clients (ref: setup_clients,
# federated_simulation.py:243-274 — LOW/MED/HIGH power, 5-50 Mbps,
# 500-2000 samples)
CAPABILITY_CYCLE = (
    {"compute_power": ComputePowerLevel.LOW, "network_bandwidth": 5},
    {"compute_power": ComputePowerLevel.MEDIUM, "network_bandwidth": 10},
    {"compute_power": ComputePowerLevel.HIGH, "network_bandwidth": 25},
    {"compute_power": ComputePowerLevel.MEDIUM, "network_bandwidth": 50},
)


@dataclasses.dataclass
class SimulationConfig:
    """ref: SimulationConfig, federated_simulation.py:29-83."""

    dataset: str = "mnist"
    num_clients: int = 5
    num_rounds: int = 10
    target_accuracy: float = 0.91
    timeout_s: float = 3600.0
    partition_strategy: str = "non_iid"
    alpha: float = 0.5
    local_epochs: int = 5
    batch_size: int = 32
    learning_rate: float = 0.001
    proximal_mu: float = 0.0  # FedProx (0.0 = plain FedAvg local training)
    privacy_epsilon: Optional[float] = 1.0
    privacy_delta: float = 1e-5
    max_grad_norm: float = 1.0
    dp_mode: str = "delta"  # "none" | "delta" | "dp_sgd" | "client_dp" | "dp_ftrl"
    participation_rate: float = 1.0
    straggler_dropout_rate: float = 0.0
    heterogeneous_clients: bool = True
    seed: int = 0
    backend: str = "onchip"  # "onchip" | "grpc"
    # secure aggregation: onchip -> in-superstep pairwise masking
    # (fl.secure_agg); grpc -> DH-keyed masked uploads over the wire
    # (services.secagg_wire)
    secure_aggregation: bool = False
    # distributed DP over the grpc backend (fl.distributed_dp +
    # secagg_wire integer payloads): clients ship Skellam-noised integer
    # deltas; only the modular sum is decodable. Requires
    # secure_aggregation=True; privacy_epsilon/noise_multiplier feed the
    # shared plan.
    distributed_dp: bool = False
    ddp_bits: int = 14
    # wire adaptive clipping over the grpc backend (Andrew et al. 2021;
    # services/grpc_server.py + federated_trainer.py): the coordinator
    # steers privacy_config.max_grad_norm toward the clip_target_quantile
    # of client delta norms from locally-DP-noised indicators. Plain
    # (non-secagg, non-ddp) DP path only.
    adaptive_clipping: bool = False
    clip_target_quantile: float = 0.5
    clip_learning_rate: float = 0.2
    clip_count_stddev: float = 0.5
    # test-only determinism hook: when set, client i's DP noise secret is
    # sha256(f"{dp_noise_seed}:{i}") so noise realizations are repeatable.
    # Production leaves this None -> per-client os.urandom secrets (DP
    # noise must never be derivable from public identifiers; ADVICE r4).
    dp_noise_seed: Optional[int] = None
    n_train_synth: int = 20_000
    n_test_synth: int = 4_000
    samples_per_client: Optional[int] = None
    noise_multiplier: float = 1.0  # z for dp_sgd / client_dp / dp_ftrl
    # passthroughs for engine capabilities beyond the reference surface
    # (scaffold, dp_ftrl knobs, robust aggregation, uplink compression,
    # server optimizers, ...): merged into RoundEngineConfig /
    # FederatedTrainingConfig as extra fields
    engine_overrides: Dict[str, Any] = dataclasses.field(
        default_factory=dict)
    training_overrides: Dict[str, Any] = dataclasses.field(
        default_factory=dict)


class FederatedLearningSimulation:
    """ref: FederatedLearningSimulation, federated_simulation.py:194-528."""

    def __init__(self, config: Optional[SimulationConfig] = None):
        self.config = config or SimulationConfig()
        self.metrics = MetricsCollector()
        self.results: Dict[str, Any] = {}

    # ------------------------------------------------------------------
    def run_simulation(self) -> Dict[str, Any]:
        """ref: run_simulation, federated_simulation.py:362-428."""
        cfg = self.config
        logger.info("simulation: %d clients, %s, backend=%s",
                    cfg.num_clients, cfg.dataset, cfg.backend)
        t0 = time.time()
        if cfg.backend == "grpc":
            results = self._run_grpc()
        else:
            results = self._run_onchip()
        results["wall_time_s"] = time.time() - t0
        results["config"] = dataclasses.asdict(self.config)
        self.results = results
        return results

    # -- onchip backend ------------------------------------------------------
    def _build_engine(self) -> FederatedRoundEngine:
        from fl_tpu.data import load_dataset, make_federated_arrays

        cfg = self.config
        splits = load_dataset(cfg.dataset, n_train_synth=cfg.n_train_synth,
                              n_test_synth=cfg.n_test_synth, seed=cfg.seed)
        arrays = make_federated_arrays(
            splits, num_clients=cfg.num_clients,
            strategy=cfg.partition_strategy, alpha=cfg.alpha,
            samples_per_client=cfg.samples_per_client, seed=cfg.seed,
        )
        model = get_model_for_dataset(cfg.dataset)
        privacy = None
        if cfg.privacy_epsilon and cfg.dp_mode != "none":
            privacy = PrivacyConfig(
                epsilon=cfg.privacy_epsilon, delta=cfg.privacy_delta,
                max_grad_norm=cfg.max_grad_norm,
                noise_multiplier=cfg.noise_multiplier,
            )
        engine_cfg = RoundEngineConfig(
            training=FederatedTrainingConfig(
                local_epochs=cfg.local_epochs, batch_size=cfg.batch_size,
                learning_rate=cfg.learning_rate,
                proximal_mu=cfg.proximal_mu,
                **cfg.training_overrides,
            ),
            dp_mode=cfg.dp_mode if privacy else "none",
            privacy=privacy,
            epsilon_per_round=(cfg.privacy_epsilon / max(cfg.num_rounds, 1)
                               if privacy else None),
            delta_per_round=(cfg.privacy_delta / max(cfg.num_rounds, 1)
                             if privacy else None),
            participation_rate=cfg.participation_rate,
            straggler_dropout_rate=cfg.straggler_dropout_rate,
            max_clients=cfg.num_clients,
            seed=cfg.seed,
            secure_aggregation=cfg.secure_aggregation,
            **cfg.engine_overrides,
        )
        augment = None
        if cfg.dataset == "cifar10":
            from fl_tpu.ops.preprocess import make_cifar_augment

            augment = make_cifar_augment()
        x, y = splits.normalized(splits.test_images), splits.test_labels
        engine = FederatedRoundEngine(
            model, arrays, engine_cfg, test_images=x, test_labels=y,
            augment_fn=augment,
        )
        if cfg.heterogeneous_clients:
            # map the capability cycle to per-client epoch budgets (the
            # vmapped analog of the reference's adaptive configs)
            budgets = []
            for i in range(cfg.num_clients):
                profile = CAPABILITY_CYCLE[i % len(CAPABILITY_CYCLE)]
                adaptive = create_adaptive_config({
                    "compute_power": profile["compute_power"].value,
                    "network_bandwidth": profile["network_bandwidth"],
                    "available_samples": int(arrays.num_samples[i]),
                })
                budgets.append(min(adaptive.local_epochs, cfg.local_epochs))
            engine.epochs_per_client = np.asarray(budgets, np.int32)
        return engine

    def _run_onchip(self) -> Dict[str, Any]:
        cfg = self.config
        engine = self._build_engine()
        deadline = time.time() + cfg.timeout_s
        reason = "round_budget_exhausted"
        for r in range(cfg.num_rounds):
            if time.time() > deadline:
                reason = "timeout"
                break
            self.metrics.start_round(engine.round_number)
            result = engine.run_round()
            self.metrics.complete_round(
                result.round_number, result.train_loss,
                result.test_accuracy or result.train_accuracy,
                result.convergence_score,
                aggregation_time_s=result.round_time_s,
            )
            logger.info("round %d: acc=%.4f loss=%.4f (%.2fs)",
                        result.round_number,
                        result.test_accuracy or -1, result.train_loss,
                        result.round_time_s)
            if (result.test_accuracy is not None
                    and result.test_accuracy >= cfg.target_accuracy):
                reason = "target_accuracy_reached"
                break
        return self._collect_results(engine, reason)

    def _collect_results(self, engine: FederatedRoundEngine,
                         reason: str) -> Dict[str, Any]:
        """ref: _collect_results, federated_simulation.py:430-528."""
        hist = engine.history
        accs = [r.test_accuracy for r in hist if r.test_accuracy is not None]
        return {
            "backend": "onchip",
            "stop_reason": reason,
            "rounds_completed": len(hist),
            "final_accuracy": accs[-1] if accs else None,
            "best_accuracy": max(accs) if accs else None,
            "final_loss": hist[-1].train_loss if hist else None,
            "avg_round_time_s": float(np.mean([r.round_time_s
                                               for r in hist])) if hist else 0,
            "rounds_per_sec": (len(hist) / sum(r.round_time_s for r in hist)
                               if hist else 0.0),
            "total_epsilon_spent": sum(r.epsilon_spent for r in hist),
            "privacy_budget": (engine.budget_tracker.get_budget_status()
                               if engine.budget_tracker else None),
            "convergence": engine.detector.get_convergence_summary(),
            "round_history": [dataclasses.asdict(r) for r in hist],
            "training_progress": self.metrics.get_training_progress(),
        }

    # -- grpc backend (reference-parity integration) -----------------------------
    def _run_grpc(self) -> Dict[str, Any]:
        from fl_tpu.core.types import RoundConfig
        from fl_tpu.services.federated_trainer import FederatedTrainer
        from fl_tpu.services.grpc_server import (
            CoordinatorGRPCServer,
            FederatedLearningServicer,
        )

        cfg = self.config
        privacy = (PrivacyConfig(cfg.privacy_epsilon, cfg.privacy_delta,
                                 cfg.max_grad_norm,
                                 noise_multiplier=cfg.noise_multiplier)
                   if cfg.privacy_epsilon
                   and (cfg.dp_mode != "none" or cfg.distributed_dp)
                   else None)
        servicer = FederatedLearningServicer(
            round_config=RoundConfig(
                min_clients=(cfg.num_clients if cfg.secure_aggregation
                             else min(2, cfg.num_clients)),
                max_clients=cfg.num_clients,
                local_epochs=cfg.local_epochs, batch_size=cfg.batch_size,
                learning_rate=cfg.learning_rate, privacy_config=privacy,
            ),
            secure_aggregation=cfg.secure_aggregation,
            distributed_dp=cfg.distributed_dp,
            ddp_bits=cfg.ddp_bits,
            adaptive_clipping=cfg.adaptive_clipping,
            clip_target_quantile=cfg.clip_target_quantile,
            clip_learning_rate=cfg.clip_learning_rate,
            clip_count_stddev=cfg.clip_count_stddev,
            # cooperative local clients: give stragglers (first-round jit
            # compiles!) half the round timeout before declaring dropouts
            secagg_grace_s=max(30.0, cfg.timeout_s / 2),
        )
        server = CoordinatorGRPCServer(servicer, host="127.0.0.1", port=0)
        port = server.start()
        clients: List[FederatedTrainer] = []
        try:
            for i in range(cfg.num_clients):
                t = FederatedTrainer(
                    client_id=f"sim_{i}", coordinator_host="127.0.0.1",
                    coordinator_port=port, dataset=cfg.dataset,
                    privacy=privacy,
                    epsilon_per_round=(cfg.privacy_epsilon
                                       / max(cfg.num_rounds, 1)
                                       if privacy else None),
                    delta_per_round=(cfg.privacy_delta
                                     / max(cfg.num_rounds, 1)
                                     if privacy else None),
                    client_index=i, num_clients=cfg.num_clients,
                    partition_strategy=cfg.partition_strategy,
                    poll_interval_s=0.5, max_rounds=cfg.num_rounds,
                    data_seed=cfg.seed,
                    n_train_synth=cfg.n_train_synth,
                    n_test_synth=cfg.n_test_synth,
                    secure_aggregation=cfg.secure_aggregation,
                    distributed_dp=cfg.distributed_dp,
                    ddp_bits=cfg.ddp_bits,
                    adaptive_clipping=cfg.adaptive_clipping,
                    clip_count_stddev=cfg.clip_count_stddev,
                    dp_noise_secret=(
                        hashlib.sha256(
                            f"{cfg.dp_noise_seed}:{i}".encode()).digest()
                        if cfg.dp_noise_seed is not None else None),
                )
                t.initialize()
                t.start_training()
                clients.append(t)
            deadline = time.time() + cfg.timeout_s
            reason = "round_budget_exhausted"
            while time.time() < deadline:
                if all(c.rounds_completed >= cfg.num_rounds for c in clients):
                    break
                if servicer.global_model is not None:
                    gm = servicer.global_model
                    acc = gm.get_accuracy()
                    if acc is None:
                        acc = gm.get_accuracy("train")
                    if acc is not None and acc >= cfg.target_accuracy:
                        reason = "target_accuracy_reached"
                        break
                time.sleep(0.5)
            else:
                reason = "timeout"
            # clients count a round done at upload; the servicer's aggregation
            # thread may still be averaging the final round (first-round jit
            # compile alone can take tens of seconds) — drain it so
            # current_round / global_model reflect every submitted update
            while (servicer.current_round < cfg.num_rounds
                   and (servicer._aggregating
                        or any(servicer.pending_updates.values()))
                   and time.time() < deadline):
                time.sleep(0.5)
            return {
                "backend": "grpc",
                "stop_reason": reason,
                "rounds_completed": servicer.current_round,
                "final_accuracy": (
                    servicer.global_model.get_accuracy()
                    if servicer.global_model is not None
                    and servicer.global_model.get_accuracy() is not None
                    else servicer.global_model.get_accuracy("train")
                    if servicer.global_model is not None else None),
                "client_results": {c.client_id: c.get_status()
                                   for c in clients},
                # wire adaptive clipping: the coordinator's clip-norm
                # trajectory (one entry per aggregation that saw
                # indicators), for assertions and run reports
                "clip_norm_history": [
                    v for _, v in
                    servicer.metrics_history.get("clip_norm", [])],
            }
        finally:
            for c in clients:
                c.stop_training()
            server.stop()

    # ------------------------------------------------------------------
    def export_results(self, filepath: str) -> None:
        """ref: export at federated_simulation.py:518-528."""
        with open(filepath, "w") as f:
            json.dump(self.results, f, indent=2, default=str)


def run_mnist_simulation(num_clients: int = 5, num_rounds: int = 10,
                         target_accuracy: float = 0.91,
                         **kwargs: Any) -> Dict[str, Any]:
    """ref: run_mnist_simulation, federated_simulation.py:530-556."""
    cfg = SimulationConfig(dataset="mnist", num_clients=num_clients,
                           num_rounds=num_rounds,
                           target_accuracy=target_accuracy, **kwargs)
    return FederatedLearningSimulation(cfg).run_simulation()


def run_cifar10_simulation(num_clients: int = 5, num_rounds: int = 15,
                           target_accuracy: float = 0.85,
                           **kwargs: Any) -> Dict[str, Any]:
    """ref: run_cifar10_simulation, federated_simulation.py:558-599
    (ε=1.5 default for CIFAR, ref :576-579)."""
    kwargs.setdefault("privacy_epsilon", 1.5)
    cfg = SimulationConfig(dataset="cifar10", num_clients=num_clients,
                           num_rounds=num_rounds,
                           target_accuracy=target_accuracy, **kwargs)
    return FederatedLearningSimulation(cfg).run_simulation()


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="federated learning simulation")
    p.add_argument("--dataset", default="mnist", choices=["mnist", "cifar10"])
    p.add_argument("--clients", type=int, default=5)
    p.add_argument("--rounds", type=int, default=10)
    p.add_argument("--target-accuracy", type=float, default=0.91)
    p.add_argument("--backend", default="onchip", choices=["onchip", "grpc"])
    p.add_argument("--export", default=None)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    sim = FederatedLearningSimulation(SimulationConfig(
        dataset=args.dataset, num_clients=args.clients,
        num_rounds=args.rounds, target_accuracy=args.target_accuracy,
        backend=args.backend,
    ))
    results = sim.run_simulation()
    if args.export:
        sim.export_results(args.export)
    print(json.dumps({k: v for k, v in results.items()
                      if k not in ("round_history", "client_results")},
                     indent=2, default=str))
