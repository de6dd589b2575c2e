"""FedDF: server-side ensemble distillation as the aggregation step.

FedDF (Lin et al. 2020, "Ensemble Distillation for Robust Model Fusion in
Federated Learning") replaces the plain parameter average with a short
server-side *distillation* phase: after local training, the client models
form a logit ensemble over an UNLABELED proxy dataset, and the new global
model is a student initialized at the FedAvg average and trained to match
the ensemble's soft labels. Under heterogeneous (non-IID) clients the
averaged parameters sit far from any good model while the averaged
*function* (the logit ensemble) is still strong — distilling the function
back into one parameter vector recovers accuracy plain FedAvg loses.

TPU-native formulation — ONE jitted superstep per round:

- local training is the shared vmapped `lax.scan` program
  (fl_tpu.fl.local_training), identical key schedule to the flat engine;
- the teacher is never materialized as an ensemble model: each distill
  step computes per-client logits with a `vmap` over the stacked client
  variables (C batched forwards, one program) and averages them;
- the distillation loop is a `lax.scan` carrying (student params, Adam
  state, PRNG key); proxy batches are drawn on-device with
  `jax.random.randint` gathers — no host round-trips;
- under a device mesh the client axis is sharded with `shard_map`: each
  device computes the logit SUM of its local clients on the replicated
  proxy batch, one `psum` forms the ensemble mean, and every device runs
  the (deterministic) student update redundantly — the only collectives
  are the FedAvg psum and one logit psum per distill step.

distill_steps=0 degenerates to exact FedAvg (the student IS the average),
the tested anchor. The reference has no distillation machinery at all
(its aggregation is the weighted average of src/aggregation/fedavg.py:
267-288); this is a capability extension.

Deployment surface: **simulation/on-chip only.** FedDF is a pure
server-side aggregation change, so nothing about the client wire protocol
would need to change — but the gRPC coordinator
(fl_tpu.services.grpc_server) currently wires only FedAvg (reference
parity) and the distributed-DP integer path; a deployment wanting FedDF
over the wire would swap the servicer's aggregation call for
`feddf_round`'s distillation step. Until that exists, treat FedDF results
as simulation results.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fl_tpu.core import prng
from fl_tpu.fl.local_training import (
    FederatedTrainingConfig,
    make_eval_fn,
    make_local_train_fn,
)
from fl_tpu.models.base import FLModel, Variables

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from fl_tpu.data.federated import FederatedArrays


@dataclasses.dataclass(frozen=True)
class FedDFConfig:
    """FedDF knobs (paper defaults: Adam distillation, temperature 1)."""

    training: FederatedTrainingConfig = dataclasses.field(
        default_factory=FederatedTrainingConfig)
    distill_steps: int = 64          # server SGD steps per round (0 = FedAvg)
    distill_batch: int = 256         # proxy examples per distill step
    distill_lr: float = 1e-3         # student optimizer lr
    # "adam" (the paper's choice) | "sgd". Note Adam is scale-invariant:
    # it takes lr-sized steps even from numerically-tiny gradients, so
    # when the average already matches the ensemble (near-zero KL) it
    # drifts where SGD holds an exact fixpoint.
    distill_optimizer: str = "adam"
    temperature: float = 1.0         # softmax temperature τ (loss is τ²·KL)
    seed: int = 0


@dataclasses.dataclass
class FedDFRoundResult:
    round_number: int
    train_loss: float
    train_accuracy: float
    # τ²·KL(ensemble ‖ student) on a FIXED probe batch (the first
    # distill_batch proxy images), measured at the FedAvg init and after
    # the distillation loop — a deterministic progress signal, unlike the
    # per-step losses on randomly-sampled batches
    distill_kl_before: float
    distill_kl_after: float
    round_time_s: float


class FedDFEngine:
    """Owns the global model, the device-resident proxy set, and the
    jitted train+distill superstep."""

    def __init__(
        self,
        model: FLModel,
        data: "FederatedArrays",
        proxy_images: np.ndarray,
        config: FedDFConfig,
        mesh=None,
    ):
        if config.distill_steps < 0:
            raise ValueError("distill_steps must be >= 0")
        if config.temperature <= 0:
            raise ValueError("temperature must be > 0")
        proxy_images = np.asarray(proxy_images)
        if proxy_images.dtype != np.uint8:
            raise ValueError(
                "proxy_images must be uint8 pixels (the engine applies the "
                "dataset's normalization on-device, matching local "
                "training)")
        if proxy_images.shape[1:] != tuple(data.images.shape[2:]):
            raise ValueError(
                f"proxy image shape {proxy_images.shape[1:]} does not "
                f"match client data {tuple(data.images.shape[2:])}")
        if (config.distill_steps > 0
                and proxy_images.shape[0] < config.distill_batch):
            raise ValueError(
                f"proxy set ({proxy_images.shape[0]}) smaller than "
                f"distill_batch ({config.distill_batch})")
        self.model = model
        self.config = config
        self.mesh = mesh
        self.num_clients = data.num_clients
        if mesh is not None and data.num_clients % mesh.devices.size != 0:
            raise ValueError(
                f"num_clients={data.num_clients} must divide evenly over "
                f"the {mesh.devices.size}-device mesh")
        self.data = data.to_device(mesh)
        self.round_number = 0
        self._root_key = prng.root_key(config.seed)
        self.global_variables: Variables = model.init(
            prng.stream_key(self._root_key, prng.Stream.INIT))
        if config.distill_optimizer == "adam":
            self._opt = optax.adam(config.distill_lr)
        elif config.distill_optimizer == "sgd":
            self._opt = optax.sgd(config.distill_lr)
        else:
            raise ValueError(
                f"distill_optimizer={config.distill_optimizer!r}: "
                "expected 'adam' or 'sgd'")
        if mesh is not None:
            from fl_tpu.core.mesh import replicate_tree

            self.global_variables = replicate_tree(self.global_variables,
                                                   mesh)
            self._proxy = replicate_tree(jnp.asarray(proxy_images), mesh)
        else:
            self._proxy = jnp.asarray(proxy_images)
        self._superstep = self._build_superstep()
        self._eval_fn = make_eval_fn(model)
        self.history: List[FedDFRoundResult] = []

    # ------------------------------------------------------------------
    def _build_superstep(self):
        cfg = self.config
        data = self.data
        model = self.model
        tau = cfg.temperature
        mean = jnp.asarray(data.mean, jnp.float32)
        std = jnp.asarray(data.std, jnp.float32)
        local_train = make_local_train_fn(
            model, cfg.training,
            samples_per_client=data.samples_per_client,
            mean=data.mean, std=data.std, homogeneous_epochs=True)
        epochs = jnp.int32(cfg.training.local_epochs)

        def normalize(x_u8):
            return (x_u8.astype(jnp.float32) / 255.0 - mean) / std

        def ensemble_logit_sum(client_vars, xb):
            """Σ_c logits_c(xb) over THIS shard's clients — (B, K) f32."""
            logits = jax.vmap(
                lambda v: model.apply(v, xb, train=False)[0]
            )(client_vars)
            return logits.astype(jnp.float32).sum(0)

        def body(global_vars, images, labels, num_samples, proxy, keys,
                 distill_key, psum_, num_clients_total):
            trained, metrics = jax.vmap(
                local_train, in_axes=(None, 0, 0, 0, None, 0)
            )(global_vars, images, labels, num_samples, epochs, keys)
            # FedAvg init for the student (sample-weighted, like the flat
            # engine)
            w = num_samples.astype(jnp.float32)
            wsum = jnp.maximum(psum_(w.sum()), 1e-12)
            avg = jax.tree.map(
                lambda l: (psum_(jnp.einsum(
                    "c,c...->...", w, l.astype(jnp.float32),
                    preferred_element_type=jnp.float32)) / wsum
                ).astype(l.dtype),
                trained)

            def kd_loss(p, xb, teacher):
                """τ²·KL(teacher ‖ student); the teacher-entropy term is
                constant in p but kept so the loss → 0 as the student
                matches the ensemble."""
                s_logits, _ = model.apply(
                    {**avg, "params": p}, xb, train=False)
                logp = jax.nn.log_softmax(
                    s_logits.astype(jnp.float32) / tau, axis=-1)
                kl = (teacher * (jnp.log(teacher + 1e-12) - logp)
                      ).sum(-1).mean()
                return tau * tau * kl

            def teacher_probs(xb):
                # teacher: uniform ensemble mean over ALL clients
                t_sum = psum_(ensemble_logit_sum(trained, xb))
                return jax.nn.softmax(t_sum / num_clients_total / tau,
                                      axis=-1)

            def distill_step(carry, _):
                params, opt_state, key = carry
                key, bkey = jax.random.split(key)
                idx = jax.random.randint(
                    bkey, (cfg.distill_batch,), 0, proxy.shape[0])
                xb = normalize(jnp.take(proxy, idx, axis=0))
                teacher = teacher_probs(xb)
                loss, grads = jax.value_and_grad(kd_loss)(params, xb,
                                                          teacher)
                updates, opt_state = self._opt.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, key), loss

            student = avg["params"]
            if cfg.distill_steps > 0:
                # fixed probe batch: a deterministic before/after progress
                # signal (per-step losses ride on random batches)
                xb0 = normalize(proxy[:cfg.distill_batch])
                teacher0 = teacher_probs(xb0)
                kl_before = kd_loss(student, xb0, teacher0)
                (student, _, _), _ = jax.lax.scan(
                    distill_step,
                    (student, self._opt.init(student), distill_key),
                    None, length=cfg.distill_steps)
                kl_after = kd_loss(student, xb0, teacher0)
            else:
                kl_before = kl_after = jnp.float32(0.0)
            new_global = dict(avg)
            new_global["params"] = student
            out = {
                "train_loss": psum_((metrics["loss"] * w).sum()) / wsum,
                "train_accuracy":
                    psum_((metrics["accuracy"] * w).sum()) / wsum,
                "distill_kl_before": kl_before,
                "distill_kl_after": kl_after,
            }
            return new_global, out

        if self.mesh is None:
            def superstep(global_vars, images, labels, num_samples, proxy,
                          rkey, dkey):
                C = images.shape[0]
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(rkey, i)
                )(jnp.arange(C, dtype=jnp.uint32))
                return body(global_vars, images, labels, num_samples,
                            proxy, keys, dkey, lambda x: x,
                            jnp.float32(C))

            return jax.jit(superstep)

        from jax.sharding import PartitionSpec as P

        axis = self.mesh.axis_names[0]
        rep, csh = P(), P(axis)
        C_total = self.num_clients

        def sharded(global_vars, images, labels, num_samples, proxy,
                    rkey, dkey):
            CL = images.shape[0]
            base = jax.lax.axis_index(axis) * CL
            keys = jax.vmap(
                lambda i: jax.random.fold_in(rkey, i)
            )(base.astype(jnp.uint32) + jnp.arange(CL, dtype=jnp.uint32))
            return body(global_vars, images, labels, num_samples, proxy,
                        keys, dkey, lambda x: jax.lax.psum(x, axis),
                        jnp.float32(C_total))

        return jax.jit(jax.shard_map(
            sharded, mesh=self.mesh,
            in_specs=(rep, csh, csh, csh, rep, rep, rep),
            out_specs=(rep, rep),
            check_vma=False,
        ))

    # ------------------------------------------------------------------
    def run_round(self) -> FedDFRoundResult:
        t0 = time.time()
        rkey = prng.round_key(self._root_key, jnp.int32(self.round_number))
        dkey = jax.random.fold_in(
            prng.stream_key(self._root_key, prng.Stream.SERVER),
            jnp.uint32(self.round_number))
        self.global_variables, metrics = self._superstep(
            self.global_variables, self.data.images, self.data.labels,
            self.data.num_samples, self._proxy, rkey, dkey)
        result = FedDFRoundResult(
            round_number=self.round_number,
            train_loss=float(metrics["train_loss"]),
            train_accuracy=float(metrics["train_accuracy"]),
            distill_kl_before=float(metrics["distill_kl_before"]),
            distill_kl_after=float(metrics["distill_kl_after"]),
            round_time_s=time.time() - t0,
        )
        self.round_number += 1
        self.history.append(result)
        return result

    def run(self, num_rounds: int) -> List[FedDFRoundResult]:
        return [self.run_round() for _ in range(num_rounds)]

    def evaluate(self, images: np.ndarray, labels: np.ndarray
                 ) -> Dict[str, float]:
        """Global-model accuracy on NORMALIZED images (same contract as
        the flat engine's eval)."""
        out = self._eval_fn(self.global_variables, jnp.asarray(images),
                            jnp.asarray(labels))
        return {k: np.asarray(v) for k, v in out.items()}
