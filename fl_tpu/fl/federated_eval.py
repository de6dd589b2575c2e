"""Federated evaluation: score the global model on every client's own
shard, in one program.

The reference evaluates client-side (each FederatedTrainer scores the
downloaded global model on its local data, src/client/federated_trainer
.py:390-426) and the coordinator only sees the aggregated numbers. This
module is that protocol TPU-natively: ONE jitted vmapped program runs
eval-mode forward passes over every padded client shard (masked to the
valid samples, chunked so the normalized f32 batch never materializes a
whole shard at once) and returns per-client loss/accuracy plus the
sample-weighted population aggregate — the number a coordinator would
get from honest client reports, with zero wire traffic.

Distinct from `make_eval_fn` (central test set) and from
`fl_tpu.fl.personalization` (which fine-tunes first): this is the plain
"how does the CURRENT global model serve each client" probe used for
fairness auditing (per-client accuracy spread) and convergence tracking.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from fl_tpu.fl.local_training import cross_entropy_loss
from fl_tpu.models.base import FLModel, Variables


def make_federated_eval_fn(
    model: FLModel,
    samples_per_client: int,
    mean,
    std,
    chunk_size: int = 256,
) -> Callable:
    """Build the single-client masked evaluation function.

    Returns ``fn(variables, images_u8, labels, n_valid) -> metrics`` with
    scalars ``loss`` / ``accuracy`` / ``n`` (valid count). vmap over the
    leading client axis for the population version.
    """
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    N = samples_per_client
    chunk = min(chunk_size, N)
    n_chunks = -(-N // chunk)
    pad_to = n_chunks * chunk

    def evaluate(variables: Variables, images_u8, labels, n_valid):
        n = n_valid.astype(jnp.int32)
        if pad_to != N:
            images_u8 = jnp.pad(
                images_u8, ((0, pad_to - N),) + ((0, 0),) * (
                    images_u8.ndim - 1))
            labels = jnp.pad(labels, (0, pad_to - N))
        xs = images_u8.reshape((n_chunks, chunk) + images_u8.shape[1:])
        ys = labels.reshape((n_chunks, chunk))

        def body(carry, idx_xy):
            ci, xb, yb = idx_xy
            x = (xb.astype(jnp.float32) / 255.0 - mean) / std
            logits, _ = model.apply(variables, x, train=False)
            pos = ci * chunk + jnp.arange(chunk)
            msk = (pos < n).astype(jnp.float32)
            per = cross_entropy_loss(logits, yb, reduce=False)
            loss_sum, correct_sum = carry
            loss_sum = loss_sum + (per * msk).sum()
            correct_sum = correct_sum + (
                (jnp.argmax(logits, -1) == yb) * msk).sum()
            return (loss_sum, correct_sum), None

        (loss_sum, correct_sum), _ = jax.lax.scan(
            body, (jnp.float32(0.0), jnp.float32(0.0)),
            (jnp.arange(n_chunks), xs, ys))
        denom = jnp.maximum(n.astype(jnp.float32), 1.0)
        return {
            "loss": loss_sum / denom,
            "accuracy": correct_sum / denom,
            "n": n,
        }

    return evaluate


def evaluate_federated(engine) -> Dict[str, object]:
    """Score a FederatedRoundEngine's current global model on every
    client's own shard. One compiled program (cached on the engine);
    under a mesh the work is device-local (no collectives — the host
    combines the per-client scalars). Returns per-client arrays plus the
    sample-weighted mean and the accuracy spread (fairness signal)."""
    import numpy as np

    run = getattr(engine, "_federated_eval_cache", None)
    if run is None:
        fn = make_federated_eval_fn(
            engine.model,
            samples_per_client=engine.data.samples_per_client,
            mean=engine.data.mean, std=engine.data.std)

        def batch(variables, images, labels, num_samples):
            stacked = jax.tree.map(
                lambda x: jnp.broadcast_to(
                    x[None], (images.shape[0],) + x.shape), variables)
            return jax.vmap(fn)(stacked, images, labels, num_samples)

        if engine.mesh is not None:
            from jax.sharding import PartitionSpec as P

            axis = engine.mesh.axis_names[0]
            rep, csh = P(), P(axis)
            run = jax.jit(jax.shard_map(
                batch, mesh=engine.mesh,
                in_specs=(rep, csh, csh, csh),
                out_specs=csh,
                check_vma=False,
            ))
        else:
            run = jax.jit(batch)
        engine._federated_eval_cache = run
    out = run(engine.global_variables, engine.data.images,
              engine.data.labels, engine.data.num_samples)
    out = {k: np.asarray(v) for k, v in out.items()}
    w = out["n"].astype(np.float64)
    w = w / max(w.sum(), 1.0)
    return {
        "per_client": out,
        "loss": float((out["loss"] * w).sum()),
        "accuracy": float((out["accuracy"] * w).sum()),
        "accuracy_min": float(out["accuracy"].min()),
        "accuracy_max": float(out["accuracy"].max()),
        "accuracy_std": float(out["accuracy"].std()),
    }
