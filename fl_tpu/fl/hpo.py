"""Federated hyperparameter search: a vmapped population sweep with
successive halving.

Tuning federated learning is notoriously expensive because every
hyperparameter trial is a full multi-round federated run. On TPU the
population CAN be a tensor axis: G candidate configurations × C clients
train as ONE jitted superstep — the G global models are a stacked pytree,
local training is vmapped over the (G, C) grid (the learning rate rides
as a traced per-trial input through ``make_local_train_fn(traced_lr=
True)``; per-trial epoch budgets reuse the masked heterogeneous-epoch
machinery), per-trial FedAvg is one einsum, and per-trial validation is a
vmapped forward. Successive halving (Jamieson & Talwalkar 2016; the
synchronous rung schedule of ASHA, Li et al. 2020) then prunes the
population at fixed round rungs, COMPACTING the surviving trials into a
smaller stacked tree (one gather + a recompile per rung — ⌈log_η G⌉
recompiles total) so dead trials cost zero FLOPs, unlike a masked
formulation.

Under a device mesh the CLIENT axis is sharded (the same axis the flat
engine shards); trials are replicated, so the only collectives are the
per-trial FedAvg psums — the sweep adds no communication.

The reference has no tuning machinery at all (hyperparameters are static
YAML, config/client.yaml:8-14); this is a capability extension that a
single-GPU torch design could not express as one program.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fl_tpu.core import prng
from fl_tpu.fl.local_training import (
    FederatedTrainingConfig,
    make_local_train_fn,
)
from fl_tpu.models.base import FLModel, Variables

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from fl_tpu.data.federated import FederatedArrays


@dataclasses.dataclass(frozen=True)
class HPOConfig:
    """Sweep knobs. ``learning_rates`` (and optional ``epoch_budgets``,
    broadcast if scalar) define the trial grid; ``rung_rounds`` are the
    round indices AFTER which the population is halved."""

    training: FederatedTrainingConfig = dataclasses.field(
        default_factory=FederatedTrainingConfig)
    learning_rates: Sequence[float] = (0.001, 0.01, 0.1)
    epoch_budgets: Optional[Sequence[int]] = None  # default: training's
    rung_rounds: Sequence[int] = ()   # e.g. (4, 8): halve after rounds 4, 8
    eta: int = 2                      # keep ⌈alive/η⌉ per rung
    seed: int = 0


@dataclasses.dataclass
class Trial:
    """One hyperparameter candidate and its life story."""

    trial_id: int
    learning_rate: float
    epochs: int
    alive: bool = True
    killed_at_round: Optional[int] = None
    val_history: List[float] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class HPORoundResult:
    round_number: int
    alive_trials: int
    val_accuracies: Dict[int, float]   # trial_id -> validation accuracy
    best_trial_id: int
    best_val_accuracy: float
    halved: bool
    round_time_s: float


class FederatedHPOEngine:
    """Owns the stacked per-trial global models and the (G, C) superstep.

    ``val_images``/``val_labels`` are uint8/int32 host arrays (the engine
    normalizes on device); rung decisions rank trials by validation
    accuracy.
    """

    def __init__(
        self,
        model: FLModel,
        data: "FederatedArrays",
        config: HPOConfig,
        val_images: np.ndarray,
        val_labels: np.ndarray,
        mesh=None,
    ):
        lrs = [float(x) for x in config.learning_rates]
        if not lrs:
            raise ValueError("learning_rates must be non-empty")
        if any(lr < 0 for lr in lrs):
            raise ValueError("learning rates must be >= 0")
        if config.epoch_budgets is None:
            eps = [config.training.local_epochs] * len(lrs)
        else:
            eps = [int(e) for e in config.epoch_budgets]
            if len(eps) != len(lrs):
                raise ValueError(
                    f"epoch_budgets ({len(eps)}) must match "
                    f"learning_rates ({len(lrs)})")
            if any(e < 0 for e in eps):
                raise ValueError("epoch budgets must be >= 0")
            if max(eps) > config.training.local_epochs:
                raise ValueError(
                    "epoch budgets exceed training.local_epochs (the "
                    "compiled max — raise it to cover the largest budget)")
        if config.eta < 2:
            raise ValueError("eta must be >= 2")
        if list(config.rung_rounds) != sorted(set(config.rung_rounds)):
            raise ValueError("rung_rounds must be strictly increasing")
        val_images = np.asarray(val_images)
        if val_images.dtype != np.uint8:
            raise ValueError("val_images must be uint8 (normalized "
                             "on-device like training shards)")
        self.model = model
        self.config = config
        self.mesh = mesh
        self.num_clients = data.num_clients
        if mesh is not None and data.num_clients % mesh.devices.size != 0:
            raise ValueError(
                f"num_clients={data.num_clients} must divide evenly over "
                f"the {mesh.devices.size}-device mesh")
        self.data = data.to_device(mesh)
        self.trials: List[Trial] = [
            Trial(trial_id=i, learning_rate=lr, epochs=e)
            for i, (lr, e) in enumerate(zip(lrs, eps))
        ]
        self._alive_ids = list(range(len(self.trials)))
        self.round_number = 0
        self._root_key = prng.root_key(config.seed)
        init = model.init(prng.stream_key(self._root_key, prng.Stream.INIT))
        G = len(self.trials)
        # every trial starts from the SAME init (the sweep isolates the
        # hyperparameters, not the init seed)
        self.trial_variables: Variables = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (G,) + x.shape).copy(),
            init)
        self._mean = np.asarray(data.mean, np.float32)
        self._std = np.asarray(data.std, np.float32)
        self._val_x = jnp.asarray(
            (val_images.astype(np.float32) / 255.0 - self._mean)
            / self._std)
        self._val_y = jnp.asarray(val_labels, jnp.int32)
        if mesh is not None:
            from fl_tpu.core.mesh import replicate_tree

            self.trial_variables = replicate_tree(self.trial_variables,
                                                  mesh)
            self._val_x = replicate_tree(self._val_x, mesh)
            self._val_y = replicate_tree(self._val_y, mesh)
        self._superstep = self._build_superstep()
        self.history: List[HPORoundResult] = []

    # ------------------------------------------------------------------
    def _build_superstep(self):
        cfg = self.config
        data = self.data
        model = self.model
        local_train = make_local_train_fn(
            model, cfg.training,
            samples_per_client=data.samples_per_client,
            mean=data.mean, std=data.std,
            traced_lr=True)  # heterogeneous budgets: masked epochs

        def val_accuracy(trial_vars, val_x, val_y):
            logits, _ = model.apply(trial_vars, val_x, train=False)
            return (jnp.argmax(logits, -1) == val_y).mean()

        def body(trial_vars, lrs, eps, images, labels, num_samples,
                 keys, val_x, val_y, psum_):
            def one_trial(tv, lr, ep, tkeys):
                trained, _ = jax.vmap(
                    lambda im, lb, n, k: local_train(
                        tv, im, lb, n, ep, k, lr=lr)
                )(images, labels, num_samples, tkeys)
                w = num_samples.astype(jnp.float32)
                wsum = jnp.maximum(psum_(w.sum()), 1e-12)
                return jax.tree.map(
                    lambda l: (psum_(jnp.einsum(
                        "c,c...->...", w, l.astype(jnp.float32),
                        preferred_element_type=jnp.float32)) / wsum
                    ).astype(l.dtype),
                    trained)

            # keys: (G, C_local); vmap trials over models/lr/epochs/keys
            new_vars = jax.vmap(one_trial)(trial_vars, lrs, eps, keys)
            accs = jax.vmap(val_accuracy, in_axes=(0, None, None))(
                new_vars, val_x, val_y)
            return new_vars, accs

        if self.mesh is None:
            def superstep(trial_vars, lrs, eps, images, labels,
                          num_samples, rkey):
                G = lrs.shape[0]
                C = images.shape[0]
                keys = jax.vmap(jax.vmap(
                    lambda g, c: jax.random.fold_in(
                        jax.random.fold_in(rkey, g), c),
                    in_axes=(None, 0)), in_axes=(0, None))(
                    jnp.arange(G, dtype=jnp.uint32),
                    jnp.arange(C, dtype=jnp.uint32))
                return body(trial_vars, lrs, eps, images, labels,
                            num_samples, keys, self._val_x, self._val_y,
                            lambda x: x)

            return jax.jit(superstep)

        from jax.sharding import PartitionSpec as P

        axis = self.mesh.axis_names[0]
        rep, csh = P(), P(axis)

        def sharded(trial_vars, lrs, eps, images, labels, num_samples,
                    val_x, val_y, rkey):
            G = lrs.shape[0]
            CL = images.shape[0]
            base = jax.lax.axis_index(axis) * CL
            keys = jax.vmap(jax.vmap(
                lambda g, c: jax.random.fold_in(
                    jax.random.fold_in(rkey, g), c),
                in_axes=(None, 0)), in_axes=(0, None))(
                jnp.arange(G, dtype=jnp.uint32),
                base.astype(jnp.uint32)
                + jnp.arange(CL, dtype=jnp.uint32))
            return body(trial_vars, lrs, eps, images, labels, num_samples,
                        keys, val_x, val_y,
                        lambda x: jax.lax.psum(x, axis))

        jitted = jax.jit(jax.shard_map(
            sharded, mesh=self.mesh,
            in_specs=(rep, rep, rep, csh, csh, csh, rep, rep, rep),
            out_specs=(rep, rep),
            check_vma=False,
        ))

        def superstep(trial_vars, lrs, eps, images, labels, num_samples,
                      rkey):
            return jitted(trial_vars, lrs, eps, images, labels,
                          num_samples, self._val_x, self._val_y, rkey)

        return superstep

    # ------------------------------------------------------------------
    def _alive_arrays(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        lrs = jnp.asarray([self.trials[i].learning_rate
                           for i in self._alive_ids], jnp.float32)
        eps = jnp.asarray([self.trials[i].epochs
                           for i in self._alive_ids], jnp.int32)
        return lrs, eps

    def run_round(self) -> HPORoundResult:
        t0 = time.time()
        rkey = prng.round_key(self._root_key, jnp.int32(self.round_number))
        lrs, eps = self._alive_arrays()
        self.trial_variables, accs = self._superstep(
            self.trial_variables, lrs, eps, self.data.images,
            self.data.labels, self.data.num_samples, rkey)
        accs = np.asarray(accs)
        val_by_id: Dict[int, float] = {}
        for pos, tid in enumerate(self._alive_ids):
            a = float(accs[pos])
            val_by_id[tid] = a
            self.trials[tid].val_history.append(a)
        halved = False
        if self.round_number in self.config.rung_rounds \
                and len(self._alive_ids) > 1:
            halved = True
            keep = max(1, -(-len(self._alive_ids) // self.config.eta))
            order = np.argsort(-accs, kind="stable")[:keep]
            order = np.sort(order)  # keep stacked order deterministic
            for pos, tid in enumerate(self._alive_ids):
                if pos not in order:
                    self.trials[tid].alive = False
                    self.trials[tid].killed_at_round = self.round_number
            self._alive_ids = [self._alive_ids[p] for p in order]
            take = jnp.asarray(order, jnp.int32)
            self.trial_variables = jax.tree.map(
                lambda l: jnp.take(l, take, axis=0), self.trial_variables)
            if self.mesh is not None:
                from fl_tpu.core.mesh import replicate_tree

                self.trial_variables = replicate_tree(
                    self.trial_variables, self.mesh)
        best_tid = max(val_by_id, key=val_by_id.get)
        result = HPORoundResult(
            round_number=self.round_number,
            alive_trials=len(self._alive_ids),
            val_accuracies=val_by_id,
            best_trial_id=best_tid,
            best_val_accuracy=val_by_id[best_tid],
            halved=halved,
            round_time_s=time.time() - t0,
        )
        self.round_number += 1
        self.history.append(result)
        return result

    def run(self, num_rounds: int) -> List[HPORoundResult]:
        return [self.run_round() for _ in range(num_rounds)]

    # ------------------------------------------------------------------
    def best_trial(self) -> Trial:
        """Best ALIVE trial by its latest validation accuracy."""
        alive = [self.trials[i] for i in self._alive_ids]
        return max(alive, key=lambda t: (t.val_history or [-1.0])[-1])

    def best_variables(self) -> Variables:
        """The stacked-slot model of the current best alive trial."""
        pos = self._alive_ids.index(self.best_trial().trial_id)
        return jax.tree.map(lambda l: l[pos], self.trial_variables)
