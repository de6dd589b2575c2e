"""Host-side LocalTrainer facade for single-client (deployment) training.

Parity target: ``LocalTrainer`` (src/shared/training.py:28-404) — the
features the vmapped population path deliberately excludes because they need
data-dependent control flow: per-client train/validation split, early
stopping on validation loss, epoch checkpointing, and full evaluation with
per-class accuracy. In deployment mode (one client per process) these are
host-side concerns, so this facade drives the SAME jitted epoch function the
simulation vmaps, with a Python epoch loop around it.

The reference's train/val `random_split` bug (independent overlapping splits,
data_loader.py:344-390, SURVEY.md appendix) is not reproduced: one
permutation defines both splits.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fl_tpu.core import prng
from fl_tpu.fl.local_training import (
    FederatedTrainingConfig,
    cross_entropy_loss,
    make_eval_fn,
    make_local_train_fn,
)
from fl_tpu.models.base import FLModel, Variables

logger = logging.getLogger(__name__)


class LocalTrainer:
    """ref: LocalTrainer, src/shared/training.py:28-404."""

    def __init__(
        self,
        model: FLModel,
        config: Optional[FederatedTrainingConfig] = None,
        checkpoint_dir: Optional[str] = None,
        seed: int = 0,
    ):
        self.model = model
        self.config = config or FederatedTrainingConfig()
        self.checkpoint_dir = Path(checkpoint_dir) if checkpoint_dir else None
        self.seed = seed
        self._eval_fn = make_eval_fn(model)
        self._epoch_fns: Dict[int, Any] = {}  # keyed by shard length
        self.training_history: list = []

    # ------------------------------------------------------------------
    def _epoch_fn(self, n_pad: int, mean, std):
        if n_pad not in self._epoch_fns:
            import dataclasses

            one_epoch_cfg = dataclasses.replace(self.config, local_epochs=1)
            fn = make_local_train_fn(
                self.model, one_epoch_cfg, samples_per_client=n_pad,
                mean=mean, std=std,
            )
            self._epoch_fns[n_pad] = jax.jit(fn)
        return self._epoch_fns[n_pad]

    @staticmethod
    def _pad(images: np.ndarray, labels: np.ndarray, batch: int
             ) -> Tuple[np.ndarray, np.ndarray, int]:
        n = len(images)
        n_pad = max(batch, ((n + batch - 1) // batch) * batch)
        if n_pad != n:
            images = np.concatenate(
                [images, np.zeros((n_pad - n,) + images.shape[1:],
                                  images.dtype)])
            labels = np.concatenate(
                [labels, np.zeros((n_pad - n,), labels.dtype)])
        return images, labels, n

    # -- the main entry (ref: train_local_model, training.py:60-171) --------
    def train_local_model(
        self,
        variables: Variables,
        images_u8: np.ndarray,
        labels: np.ndarray,
        mean,
        std,
        epochs: Optional[int] = None,
        round_number: int = 0,
    ) -> Tuple[Variables, Dict[str, Any]]:
        """Train with a held-out validation split and optional early
        stopping; returns (best_variables, metrics)."""
        cfg = self.config
        epochs = epochs or cfg.local_epochs
        rng = np.random.default_rng(self.seed + round_number)

        # one permutation -> disjoint train/val (the reference's overlap bug
        # fixed)
        perm = rng.permutation(len(images_u8))
        n_val = int(len(perm) * cfg.validation_split)
        val_idx, train_idx = perm[:n_val], perm[n_val:]
        xt, yt, n_train = self._pad(images_u8[train_idx], labels[train_idx],
                                    cfg.batch_size)
        xv = images_u8[val_idx]
        yv = labels[val_idx]

        epoch_fn = self._epoch_fn(len(xt), mean, std)
        key = prng.client_key(
            prng.round_key(prng.root_key(self.seed), round_number), 0
        )

        best_vars = variables
        best_val = float("inf")
        stale = 0
        history = []
        t0 = time.time()
        for epoch in range(epochs):
            ekey = jax.random.fold_in(key, epoch)
            variables, metrics = epoch_fn(
                variables, jnp.asarray(xt), jnp.asarray(yt),
                jnp.asarray(n_train, jnp.int32), jnp.asarray(1, jnp.int32),
                ekey,
            )
            entry = {
                "epoch": epoch,
                "train_loss": float(metrics["loss"]),
                "train_accuracy": float(metrics["accuracy"]),
            }
            if n_val > 0:
                ev = self._eval_fn(
                    variables,
                    jnp.asarray(self._normalize(xv, mean, std)),
                    jnp.asarray(yv),
                )
                entry["val_loss"] = float(ev["loss"])
                entry["val_accuracy"] = float(ev["accuracy"])
                if entry["val_loss"] < best_val - 1e-6:
                    best_val = entry["val_loss"]
                    best_vars = variables
                    stale = 0
                else:
                    stale += 1
            history.append(entry)
            if cfg.save_checkpoints and self.checkpoint_dir:
                self._save_checkpoint(epoch, variables, entry)
            if (cfg.early_stopping_patience is not None and n_val > 0
                    and stale >= cfg.early_stopping_patience):
                logger.info("early stopping at epoch %d (no val improvement "
                            "for %d epochs)", epoch,
                            cfg.early_stopping_patience)
                break
        final_vars = best_vars if (n_val > 0 and cfg.early_stopping_patience
                                   is not None) else variables
        summary = {
            "epochs_completed": len(history),
            "training_time": time.time() - t0,
            "final_train_loss": history[-1]["train_loss"],
            "final_val_loss": history[-1].get("val_loss"),
            "best_val_loss": best_val if n_val > 0 else None,
            "history": history,
            "samples_processed": n_train * len(history),
        }
        self.training_history.append(summary)
        return final_vars, summary

    @staticmethod
    def _normalize(x_u8, mean, std):
        return ((np.asarray(x_u8, np.float32) / 255.0
                 - np.asarray(mean, np.float32))
                / np.asarray(std, np.float32))

    # -- evaluation (ref: evaluate_model, training.py:307-360) ---------------
    def evaluate_model(self, variables: Variables, images_u8, labels,
                       mean, std) -> Dict[str, Any]:
        ev = self._eval_fn(
            variables,
            jnp.asarray(self._normalize(images_u8, mean, std)),
            jnp.asarray(np.asarray(labels)),
        )
        return {
            "loss": float(ev["loss"]),
            "accuracy": float(ev["accuracy"]),
            "per_class_accuracy": np.asarray(
                ev["per_class_accuracy"]).tolist(),
        }

    # -- checkpoints (ref: _save_checkpoint/load_checkpoint,
    #    training.py:257-305) ------------------------------------------------
    def _save_checkpoint(self, epoch: int, variables: Variables,
                         entry: Dict[str, Any]) -> None:
        import io

        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        weights = {k: np.asarray(v) for k, v in
                   self.model.get_model_weights(variables).items()}
        buf = io.BytesIO()
        np.savez(buf, **weights)
        path = self.checkpoint_dir / f"checkpoint_epoch_{epoch}.npz"
        path.write_bytes(buf.getvalue())
        latest = self.checkpoint_dir / "latest_checkpoint.npz"
        latest.write_bytes(buf.getvalue())
        meta = {"epoch": epoch, **{k: v for k, v in entry.items()
                                   if isinstance(v, (int, float))}}
        (self.checkpoint_dir / "latest_checkpoint.json").write_text(
            json.dumps(meta))

    def load_checkpoint(self, variables: Variables,
                        path: Optional[str] = None) -> Tuple[Variables, Dict]:
        if path is None:
            if self.checkpoint_dir is None:
                raise FileNotFoundError("no checkpoint directory configured")
            path = str(self.checkpoint_dir / "latest_checkpoint.npz")
        with np.load(path, allow_pickle=False) as z:
            weights = {k: z[k] for k in z.files}
        restored = self.model.set_model_weights(variables, weights)
        meta_path = Path(path).with_suffix(".json")
        meta = (json.loads(meta_path.read_text())
                if meta_path.exists() else {})
        return restored, meta


def validate_training_data(images, labels, num_classes: int = 10
                           ) -> Dict[str, Any]:
    """Sanity-check a training shard (ref: validate_training_data,
    training.py:504-558)."""
    images = np.asarray(images)
    labels = np.asarray(labels)
    problems = []
    if len(images) != len(labels):
        problems.append("images/labels length mismatch")
    if len(images) == 0:
        problems.append("empty dataset")
    if labels.size and (labels.min() < 0 or labels.max() >= num_classes):
        problems.append("labels out of range")
    if not np.all(np.isfinite(images.astype(np.float32))):
        problems.append("non-finite pixel values")
    hist = np.bincount(labels, minlength=num_classes) if labels.size else []
    return {
        "valid": not problems,
        "problems": problems,
        "num_samples": int(len(images)),
        "class_distribution": np.asarray(hist).tolist(),
    }
