"""Checkpoint/resume for federated training.

The reference only checkpoints client-local epoch state
(LocalTrainer._save_checkpoint, src/shared/training.py:257-305) and has NO
coordinator resume-from-round (SURVEY.md §5.4). This module provides the
full thing with orbax: the global model variables, round number, privacy
budget ledger, convergence-detector state, and the experiment seed — enough
to resume a run bit-exactly (per-round PRNG keys are derived from
(seed, round), fl_tpu.core.prng, so no RNG state needs replaying).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)

CHECKPOINT_VERSION = 1


class CheckpointManager:
    """Orbax-backed round checkpoints with a JSON sidecar for host state."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.max_to_keep = max_to_keep
        import orbax.checkpoint as ocp

        self._ckpt = ocp.StandardCheckpointer()

    # ------------------------------------------------------------------
    def _step_dir(self, step: int) -> Path:
        return self.directory / f"round_{step:08d}"

    def save(self, step: int, variables: Any,
             host_state: Optional[Dict[str, Any]] = None) -> Path:
        path = self._step_dir(step)
        self._ckpt.save(path / "variables", variables, force=True)
        # orbax ≥0.11: StandardCheckpointer is an AsyncCheckpointer — the
        # directory commit happens on a background thread; block until it
        # lands so save() means "durably on disk"
        self._ckpt.wait_until_finished()
        meta = {
            "version": CHECKPOINT_VERSION,
            "round_number": step,
            "host_state": host_state or {},
        }
        (path / "meta.json").write_text(json.dumps(meta, default=float))
        self._gc()
        logger.info("checkpoint saved at %s", path)
        return path

    def restore(self, step: Optional[int] = None,
                template: Any = None) -> Dict[str, Any]:
        """Restore the given (or latest) step. ``template`` is a pytree with
        the target structure/shapes (required by orbax standard restore)."""
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints in {self.directory}")
        path = self._step_dir(step)
        variables = self._ckpt.restore(path / "variables", template)
        meta = json.loads((path / "meta.json").read_text())
        return {
            "round_number": meta["round_number"],
            "variables": variables,
            "host_state": meta.get("host_state", {}),
        }

    def latest_step(self) -> Optional[int]:
        steps = sorted(
            int(p.name.split("_")[1])
            for p in self.directory.glob("round_*") if p.is_dir()
        )
        return steps[-1] if steps else None

    def all_steps(self):
        return sorted(
            int(p.name.split("_")[1])
            for p in self.directory.glob("round_*") if p.is_dir()
        )

    def _gc(self) -> None:
        import shutil

        steps = self.all_steps()
        for step in steps[: max(0, len(steps) - self.max_to_keep)]:
            shutil.rmtree(self._step_dir(step), ignore_errors=True)


# ---------------------------------------------------------------------------
# engine integration
# ---------------------------------------------------------------------------

def save_engine_checkpoint(engine, directory: str) -> Path:
    """Snapshot a FederatedRoundEngine: model variables + round + budget +
    detector + seed."""
    mgr = CheckpointManager(directory)
    host_state: Dict[str, Any] = {
        "seed": engine.config.seed,
        "detector": {
            "best_accuracy": engine.detector.best_accuracy,
            "best_loss": (engine.detector.best_loss
                          if np.isfinite(engine.detector.best_loss) else None),
            "rounds_without_improvement":
                engine.detector.rounds_without_improvement,
        },
    }
    if engine.budget_tracker is not None:
        host_state["privacy_budget"] = engine.budget_tracker.state_dict()
    if getattr(engine, "rdp_accountant", None) is not None:
        # without this a resumed dp_sgd/client_dp run would restart RDP
        # accounting from zero and silently overdraw the ε bound
        host_state["rdp_accountant"] = engine.rdp_accountant.state_dict()
    if getattr(engine, "_pld_steps_taken", 0):
        # PLD accountant mode gates the budget on a certified step count;
        # a resume without the taken-steps counter would reopen the budget
        host_state["pld_steps_taken"] = int(engine._pld_steps_taken)
    if getattr(engine, "clip_norm", None) is not None:
        # adaptive clipping: the tracked clip norm is round state — a
        # resume without it would restart C at the initial max_grad_norm
        host_state["clip_norm"] = float(engine.clip_norm)
    path = mgr.save(engine.round_number, engine.global_variables, host_state)
    if getattr(engine, "server_opt_state", None) is not None:
        # adaptive server optimizers (FedAdam/FedYogi/FedAvgM) accumulate
        # moments across rounds; a resume without them would restart the
        # server optimizer cold
        mgr._ckpt.save(path / "server_opt_state", engine.server_opt_state,
                       force=True)
        mgr._ckpt.wait_until_finished()
    if engine.config.uplink_compression != "none":
        # uplink error feedback accumulates the compression residual per
        # client; dropping it on resume silently loses pending updates.
        # (dict wrapper: orbax StandardCheckpointer rejects bare arrays)
        mgr._ckpt.save(path / "uplink_error", {"ef": engine.uplink_error},
                       force=True)
        mgr._ckpt.wait_until_finished()
    if engine.config.dp_mode == "dp_ftrl":
        # the true prefix sum, last released noisy prefix, and momentum
        # are the mechanism state; the participation ledger enforces the
        # certified per-client budget k — losing either on resume breaks
        # the DP guarantee or the trajectory
        mgr._ckpt.save(path / "dp_ftrl",
                       {"cumsum": engine.ftrl_cumsum,
                        "prev_noisy": engine.ftrl_prev_noisy,
                        "momentum": engine.ftrl_momentum_buf,
                        "participations": engine.ftrl_participations,
                        # the tree nonce keys the regenerated node noise;
                        # a resume must reuse THIS tree's nonce or the
                        # carried noisy prefix would diverge from the
                        # future node draws
                        "tree_nonce": np.asarray(
                            [engine._ftrl_nonce & 0xFFFFFFFF,
                             engine._ftrl_nonce >> 32], np.uint32)},
                       force=True)
        mgr._ckpt.wait_until_finished()
    if engine.config.scaffold:
        # SCAFFOLD control variates are round state: resuming without
        # them restarts drift correction cold AND breaks the
        # mean(c_i) == c invariant the algorithm maintains
        mgr._ckpt.save(path / "scaffold",
                       {"c": engine.scaffold_c, "ci": engine.scaffold_ci},
                       force=True)
        mgr._ckpt.wait_until_finished()
    if engine.config.feddyn_alpha > 0:
        # FedDyn's g_i/h are first-order state: resuming without them
        # silently restarts the dynamic regularizer from zero
        mgr._ckpt.save(path / "feddyn",
                       {"h": engine.feddyn_h, "g": engine.feddyn_grads},
                       force=True)
        mgr._ckpt.wait_until_finished()
    return path


def restore_engine_checkpoint(engine, directory: str,
                              step: Optional[int] = None) -> int:
    """Restore a FederatedRoundEngine in place; returns the resumed round.

    Exactness: per-round PRNG keys are pure functions of (seed, round,
    client), so a restored engine reproduces the exact continuation of the
    original run."""
    mgr = CheckpointManager(directory)
    state = mgr.restore(step, template=engine.global_variables)
    engine.global_variables = state["variables"]
    engine.round_number = state["round_number"]
    opt_dir = mgr._step_dir(state["round_number"]) / "server_opt_state"
    if opt_dir.exists() and getattr(engine, "_server_opt", None) is not None:
        template = engine._server_opt.init(engine.global_variables["params"])
        engine.server_opt_state = mgr._ckpt.restore(opt_dir, template)
    ef_dir = mgr._step_dir(state["round_number"]) / "uplink_error"
    if ef_dir.exists() and engine.config.uplink_compression != "none":
        engine.uplink_error = mgr._ckpt.restore(
            ef_dir, {"ef": engine.uplink_error})["ef"]
    ftrl_dir = mgr._step_dir(state["round_number"]) / "dp_ftrl"
    if ftrl_dir.exists() and engine.config.dp_mode == "dp_ftrl":
        import jax

        from fl_tpu.core import prng

        st = mgr._ckpt.restore(
            ftrl_dir, {"cumsum": engine.ftrl_cumsum,
                       "prev_noisy": engine.ftrl_prev_noisy,
                       "momentum": engine.ftrl_momentum_buf,
                       "participations": engine.ftrl_participations,
                       "tree_nonce": np.zeros(2, np.uint32)})
        engine.ftrl_cumsum = st["cumsum"]
        engine.ftrl_prev_noisy = st["prev_noisy"]
        engine.ftrl_momentum_buf = st["momentum"]
        engine.ftrl_participations = np.asarray(st["participations"])
        lo, hi = (int(x) for x in np.asarray(st["tree_nonce"]))
        nonce = lo | (hi << 32)
        if nonce != engine._ftrl_nonce:
            engine._ftrl_nonce = nonce
            engine._ftrl_tree_key = jax.random.fold_in(
                jax.random.fold_in(
                    prng.stream_key(engine._root_key,
                                    prng.Stream.DP_NOISE),
                    np.uint32(lo)), np.uint32(hi))
            engine._build_pipeline()  # superstep closed over the old key
    sc_dir = mgr._step_dir(state["round_number"]) / "scaffold"
    if sc_dir.exists() and engine.config.scaffold:
        sc = mgr._ckpt.restore(
            sc_dir, {"c": engine.scaffold_c, "ci": engine.scaffold_ci})
        engine.scaffold_c, engine.scaffold_ci = sc["c"], sc["ci"]
    fd_dir = mgr._step_dir(state["round_number"]) / "feddyn"
    if fd_dir.exists() and engine.config.feddyn_alpha > 0:
        fd = mgr._ckpt.restore(
            fd_dir, {"h": engine.feddyn_h, "g": engine.feddyn_grads})
        engine.feddyn_h, engine.feddyn_grads = fd["h"], fd["g"]
    hs = state["host_state"]
    if "privacy_budget" in hs and engine.budget_tracker is not None:
        engine.budget_tracker.load_state_dict(hs["privacy_budget"])
    if "rdp_accountant" in hs and getattr(engine, "rdp_accountant", None) is not None:
        engine.rdp_accountant.load_state_dict(hs["rdp_accountant"])
    if "pld_steps_taken" in hs:
        engine._pld_steps_taken = int(hs["pld_steps_taken"])
    if "clip_norm" in hs and engine.config.adaptive_clipping:
        engine.clip_norm = float(hs["clip_norm"])
    det = hs.get("detector", {})
    engine.detector.best_accuracy = det.get("best_accuracy", 0.0)
    bl = det.get("best_loss")
    engine.detector.best_loss = float("inf") if bl is None else bl
    engine.detector.rounds_without_improvement = det.get(
        "rounds_without_improvement", 0
    )
    logger.info("engine restored at round %d from %s",
                engine.round_number, directory)
    return engine.round_number


# ---------------------------------------------------------------------------
# clustered (IFCA) engine
# ---------------------------------------------------------------------------

def save_clustered_checkpoint(engine, directory: str) -> Path:
    """Snapshot a ClusteredFederatedEngine: the k stacked cluster models +
    round + last assignments. Per-round keys derive from (seed, round),
    so this is sufficient for exact resume."""
    mgr = CheckpointManager(directory)
    host_state: Dict[str, Any] = {
        "kind": "clustered",
        "seed": engine.config.seed,
        "num_clusters": engine.config.num_clusters,
        "assignments": (None if engine.assignments is None
                        else [int(a) for a in engine.assignments]),
    }
    return mgr.save(engine.round_number, engine.cluster_variables,
                    host_state)


def restore_clustered_checkpoint(engine, directory: str,
                                 step: Optional[int] = None) -> int:
    mgr = CheckpointManager(directory)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    # validate metadata BEFORE the orbax restore — a k mismatch would
    # otherwise surface as an opaque template-shape error
    meta = json.loads((mgr._step_dir(step) / "meta.json").read_text())
    hs = meta.get("host_state", {})
    if hs.get("num_clusters") != engine.config.num_clusters:
        raise ValueError(
            f"checkpoint holds {hs.get('num_clusters')} clusters; engine "
            f"configured for {engine.config.num_clusters}")
    state = mgr.restore(step, template=engine.cluster_variables)
    hs = state["host_state"]
    engine.cluster_variables = state["variables"]
    engine.round_number = state["round_number"]
    a = hs.get("assignments")
    engine.assignments = None if a is None else np.asarray(a, np.int64)
    logger.info("clustered engine restored at round %d from %s",
                engine.round_number, directory)
    return engine.round_number


# ---------------------------------------------------------------------------
# Ditto personalizer
# ---------------------------------------------------------------------------

def save_ditto_checkpoint(personalizer, directory: str) -> Path:
    """Snapshot a DittoPersonalizer: the per-client personal models plus
    steps_taken — the step counter keys the per-pass PRNG streams, so a
    resume without it would replay already-consumed randomness. (The
    companion engine checkpoints separately via save_engine_checkpoint.)"""
    mgr = CheckpointManager(directory)
    return mgr.save(personalizer.steps_taken,
                    personalizer.personal_variables,
                    {"kind": "ditto", "lam": personalizer.lam,
                     "steps_taken": personalizer.steps_taken})


def restore_ditto_checkpoint(personalizer, directory: str,
                             step: Optional[int] = None) -> int:
    mgr = CheckpointManager(directory)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    meta = json.loads((mgr._step_dir(step) / "meta.json").read_text())
    hs = meta.get("host_state", {})
    if hs.get("kind") != "ditto":
        raise ValueError(f"{directory} does not hold a ditto checkpoint")
    state = mgr.restore(step, template=personalizer.personal_variables)
    personalizer.personal_variables = state["variables"]
    personalizer.steps_taken = int(hs["steps_taken"])
    logger.info("ditto personalizer restored at step %d from %s",
                personalizer.steps_taken, directory)
    return personalizer.steps_taken


# ---------------------------------------------------------------------------
# asynchronous (FedBuff) engine
# ---------------------------------------------------------------------------

def save_async_checkpoint(engine, directory: str) -> Path:
    """Snapshot an AsyncFederatedEngine. Beyond the model + version ring,
    async resume needs the HOST event state: the completion queue,
    per-client attempt counters, the simulated clock, and the host RNG's
    bit-generator state (service-time draws must continue the original
    stream or the restored timeline diverges)."""
    mgr = CheckpointManager(directory)
    host_state: Dict[str, Any] = {
        "kind": "async",
        "seed": engine.config.seed,
        "version": engine.version,
        "sim_time": engine.sim_time,
        "cancelled_attempts": engine.cancelled_attempts,
        "attempts": [int(a) for a in engine._attempts],
        "queue": [[float(t), int(c), int(v), int(a)]
                  for (t, c, v, a) in sorted(engine._queue)],
        "rng_state": engine._host_rng.bit_generator.state,
    }
    path = mgr.save(engine.server_step_count, engine.global_variables,
                    host_state)
    mgr._ckpt.save(path / "ring", engine.ring, force=True)
    mgr._ckpt.wait_until_finished()
    return path


def restore_async_checkpoint(engine, directory: str,
                             step: Optional[int] = None) -> int:
    import heapq

    mgr = CheckpointManager(directory)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    # validate the checkpoint kind BEFORE the orbax restore — a foreign
    # checkpoint would otherwise surface as an opaque template error
    meta = json.loads((mgr._step_dir(step) / "meta.json").read_text())
    if meta.get("host_state", {}).get("kind") != "async":
        raise ValueError(f"{directory} does not hold an async checkpoint")
    state = mgr.restore(step, template=engine.global_variables)
    hs = state["host_state"]
    engine.global_variables = state["variables"]
    engine.server_step_count = state["round_number"]
    engine.ring = mgr._ckpt.restore(
        mgr._step_dir(state["round_number"]) / "ring", engine.ring)
    engine.version = int(hs["version"])
    engine.sim_time = float(hs["sim_time"])
    engine.cancelled_attempts = int(hs["cancelled_attempts"])
    engine._attempts = np.asarray(hs["attempts"], np.int64)
    engine._queue = [(float(t), int(c), int(v), int(a))
                     for t, c, v, a in hs["queue"]]
    heapq.heapify(engine._queue)
    engine._host_rng.bit_generator.state = hs["rng_state"]
    logger.info("async engine restored at server step %d from %s",
                engine.server_step_count, directory)
    return engine.server_step_count
