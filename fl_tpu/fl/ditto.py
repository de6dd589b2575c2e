"""Ditto: fair and robust personalization via per-client models.

Li et al. 2021 ("Ditto: Fair and Robust Federated Learning Through
Personalization"). Alongside the shared global model θ_g, every client
maintains a PERSISTENT personal model v_i trained on its own data with a
pull toward the global:

    v_i ← v_i − η·(∇L_i(v_i) + λ·(v_i − θ_g))

λ interpolates between purely-local models (λ=0: no coupling, maximal
personalization, zero robustness) and the global model (λ→∞: v_i → θ_g).
The personal models never leave the client — no privacy cost — and give
each client a model tuned to its own distribution while the global round
loop (any of this framework's engines/DP modes) proceeds unchanged.

TPU mapping — exact reuse of the vmapped trainer via an algebraic
decomposition: with w starting at v_i^start,

    λ(w − θ_g) = λ(w − v_i^start) + λ(v_i^start − θ_g)

The first term IS FedProx's proximal gradient anchored at the start
(``proximal_mu=λ``), and the second is CONSTANT over the local run — it
rides the trainer's per-client ``correction`` operand (the same hook
SCAFFOLD and FedDyn use). So one `make_local_train_fn` drives all C
personal updates as a single vmapped program, sharded over the mesh like
everything else.

The reference has no personalization (its clients serve the downloaded
global model directly, src/client/federated_trainer.py:390-426);
capability extension alongside the personalization *evaluation* protocol
(fl_tpu.fl.personalization — which measures fine-tune gain, whereas
Ditto maintains the personalized models as first-class training state).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fl_tpu.core import prng
from fl_tpu.fl.local_training import (
    FederatedTrainingConfig,  # noqa: F401  (re-export convenience)
    make_local_train_fn,
)
from fl_tpu.models.base import Variables


class DittoPersonalizer:
    """Per-client personal models trained alongside a round engine.

    Usage::

        eng = FederatedRoundEngine(model, data, cfg)
        ditto = DittoPersonalizer(eng, lam=0.1)
        for _ in range(rounds):
            eng.run_round()
            ditto.step()          # one personal-update pass per round
        ditto.evaluate_personal()  # per-client accuracy of the v_i
    """

    def __init__(self, engine, lam: float,
                 personal_epochs: Optional[int] = None):
        if lam < 0:
            raise ValueError("lam must be >= 0")
        self.engine = engine
        self.lam = float(lam)
        C = engine.num_clients
        # the personal trainer is built independently of the engine's —
        # Ditto replaces any global-objective proximal term with its own
        # λ-pull, so a FedProx global objective composes fine
        tcfg = dataclasses.replace(engine.config.training, proximal_mu=0.0)
        if personal_epochs is not None:
            tcfg = dataclasses.replace(tcfg, local_epochs=personal_epochs)
        self._epochs = jnp.int32(tcfg.local_epochs)
        # personal models start at the current global model
        self.personal_variables: Variables = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (C,) + x.shape).copy(),
            engine.global_variables)
        if engine.mesh is not None:
            from fl_tpu.core.mesh import shard_client_tree

            self.personal_variables = shard_client_tree(
                self.personal_variables, engine.mesh)
        self.steps_taken = 0

        train_cfg = dataclasses.replace(tcfg, proximal_mu=self.lam)
        local_train = make_local_train_fn(
            engine.model, train_cfg,
            samples_per_client=engine.data.samples_per_client,
            mean=engine.data.mean, std=engine.data.std,
            homogeneous_epochs=True,
            scaffold=True,  # enables the per-client correction operand
        )
        lam_ = self.lam
        epochs = self._epochs

        def per_client(v_i, g_params, images, labels, n, key):
            # constant part of λ(w − θ_g): λ(v_i^start − θ_g)
            corr = jax.tree.map(
                lambda a, b: lam_ * (a.astype(jnp.float32)
                                     - b.astype(jnp.float32)),
                v_i["params"], g_params)
            new_v, metrics = local_train(v_i, images, labels, n, epochs,
                                         key, corr)
            return new_v, metrics

        def batch(personal, g_params, images, labels, n, keys):
            return jax.vmap(per_client, in_axes=(0, None, 0, 0, 0, 0))(
                personal, g_params, images, labels, n, keys)

        if engine.mesh is not None:
            from jax.sharding import PartitionSpec as P

            axis = engine.mesh.axis_names[0]
            rep, csh = P(), P(axis)
            self._step = jax.jit(jax.shard_map(
                batch, mesh=engine.mesh,
                in_specs=(csh, rep, csh, csh, csh, csh),
                out_specs=(csh, csh),
                check_vma=False,
            ))
        else:
            self._step = jax.jit(batch)
        self._eval_run = None

    # ------------------------------------------------------------------
    def step(self) -> Dict[str, float]:
        """One personal-update pass for every client against the CURRENT
        global model. Call after each engine round (Ditto Alg. 1
        interleaves the two)."""
        eng = self.engine
        C = eng.num_clients
        # fold a Ditto-specific tag on top of the PERSONALIZE stream:
        # evaluate_personalized() derives keys from the same
        # (round, PERSONALIZE) pair, and without the tag a ditto.step at
        # steps_taken == round_number would consume bitwise-identical
        # shuffle/dropout streams
        skey = jax.random.fold_in(
            prng.stream_key(
                prng.round_key(eng._root_key,
                               jnp.int32(self.steps_taken)),
                prng.Stream.PERSONALIZE),
            jnp.uint32(0xD1770))
        keys = jax.vmap(lambda i: jax.random.fold_in(skey, i))(
            jnp.arange(C, dtype=jnp.uint32))
        self.personal_variables, metrics = self._step(
            self.personal_variables, eng.global_variables["params"],
            eng.data.images, eng.data.labels, eng.data.num_samples, keys)
        self.steps_taken += 1
        w = np.asarray(eng.data.num_samples, np.float64)
        w = w / max(w.sum(), 1.0)
        return {
            "personal_loss": float(
                (np.asarray(metrics["loss"]) * w).sum()),
            "personal_accuracy": float(
                (np.asarray(metrics["accuracy"]) * w).sum()),
        }

    # ------------------------------------------------------------------
    def evaluate_personal(self) -> Dict[str, object]:
        """Per-client evaluation of each PERSONAL model on its own shard
        (the metric Ditto optimizes), plus the global model's numbers on
        the same shards for the personalization-gain comparison."""
        eng = self.engine
        from fl_tpu.fl.federated_eval import make_federated_eval_fn

        if self._eval_run is None:
            fn = make_federated_eval_fn(
                eng.model, samples_per_client=eng.data.samples_per_client,
                mean=eng.data.mean, std=eng.data.std)

            def run(personal, images, labels, n):
                return jax.vmap(fn)(personal, images, labels, n)

            if eng.mesh is not None:
                from jax.sharding import PartitionSpec as P

                axis = eng.mesh.axis_names[0]
                csh = P(axis)
                run = jax.shard_map(
                    run, mesh=eng.mesh,
                    in_specs=(csh, csh, csh, csh), out_specs=csh,
                    check_vma=False)
            self._eval_run = jax.jit(run)
        out = self._eval_run(self.personal_variables, eng.data.images,
                             eng.data.labels, eng.data.num_samples)
        out = {k: np.asarray(v) for k, v in out.items()}
        from fl_tpu.fl.federated_eval import evaluate_federated

        global_side = evaluate_federated(eng)
        w = out["n"].astype(np.float64)
        w = w / max(w.sum(), 1.0)
        personal_acc = float((out["accuracy"] * w).sum())
        return {
            "per_client": out,
            "personal_accuracy": personal_acc,
            "global_accuracy": global_side["accuracy"],
            "personalization_gain":
                personal_acc - global_side["accuracy"],
        }

    # ------------------------------------------------------------------
    def personal_model(self, i: int) -> Variables:
        if not 0 <= i < self.engine.num_clients:
            raise IndexError(f"client {i} out of range")
        return jax.tree.map(lambda l: l[i], self.personal_variables)
