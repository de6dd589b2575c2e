"""Personalization evaluation: per-client fine-tune gain on held-out data.

The global federated model is a compromise across heterogeneous client
distributions; the standard personalization protocol (FedAvg + local
fine-tuning, cf. Wang et al. 2019 "Federated Evaluation of On-device
Personalization"; Yu et al. 2020) measures what each client gains by
fine-tuning the global model on a fraction of its own shard and evaluating
on the rest. This module implements that protocol TPU-natively: ONE
jitted, vmapped program fine-tunes every client in parallel (the same
padded-shard/masking machinery as the training superstep) and returns
per-client before/after metrics.

Privacy: fine-tuning is local — the personalized weights never leave the
client, so no ε is consumed (DP applies to released aggregates only).

The reference has no personalization support (its FederatedTrainer
evaluates the downloaded global model directly,
src/client/federated_trainer.py:390-426); this is a capability extension.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from fl_tpu.fl.local_training import (
    FederatedTrainingConfig,
    cross_entropy_loss,
    make_local_train_fn,
)
from fl_tpu.models.base import FLModel, Variables


def make_personalization_fn(
    model: FLModel,
    training: FederatedTrainingConfig,
    samples_per_client: int,
    mean,
    std,
    finetune_epochs: int = 1,
    finetune_fraction: float = 0.8,
) -> Callable:
    """Build the single-client fine-tune-and-evaluate function.

    Each client's padded shard is split positionally: the first
    ``⌊finetune_fraction·n⌋`` valid samples fine-tune the global model for
    ``finetune_epochs`` (plain SGD/Adam per ``training`` — local, nothing
    released), the remaining valid samples are the held-out evaluation
    set for both the global and the personalized model.

    Returns ``fn(variables, images_u8, labels, n_valid, rng) -> metrics``
    with per-client scalars ``global_loss/global_accuracy`` (before),
    ``personalized_loss/personalized_accuracy`` (after), and
    ``n_holdout``. vmap over the leading client axis for the population.
    """
    if not 0.0 < finetune_fraction < 1.0:
        raise ValueError("finetune_fraction must be in (0, 1)")
    cfg = dataclasses.replace(training, local_epochs=finetune_epochs)
    local_train = make_local_train_fn(
        model, cfg, samples_per_client=samples_per_client,
        mean=mean, std=std, homogeneous_epochs=True,
    )
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def holdout_metrics(variables: Variables, images_u8, labels,
                        lo, hi):
        x = (images_u8.astype(jnp.float32) / 255.0 - mean) / std
        logits, _ = model.apply(variables, x, train=False)
        idx = jnp.arange(labels.shape[0])
        msk = ((idx >= lo) & (idx < hi)).astype(jnp.float32)
        denom = jnp.maximum(msk.sum(), 1.0)
        per = cross_entropy_loss(logits, labels, reduce=False)
        loss = (per * msk).sum() / denom
        acc = (((jnp.argmax(logits, -1) == labels) * msk).sum() / denom)
        return loss, acc

    def personalize(variables: Variables, images_u8, labels, n_valid, rng):
        n = jnp.maximum(n_valid.astype(jnp.int32), 1)
        # ≥1 fine-tune sample and ≥1 holdout sample whenever n ≥ 2.
        # n == 1 has no valid split: jnp.clip with inverted bounds
        # (1, 0) would yield n_ft=0 and score the TRAINING sample as
        # holdout; clamp the upper bound so n_ft=1, the holdout is
        # empty, and n_holdout=0 zero-weights the client in summaries.
        n_ft = jnp.clip((n.astype(jnp.float32)
                         * finetune_fraction).astype(jnp.int32), 1,
                        jnp.maximum(n - 1, 1))
        tuned, _ = local_train(
            variables, images_u8, labels, n_ft,
            jnp.int32(finetune_epochs), rng,
        )
        g_loss, g_acc = holdout_metrics(variables, images_u8, labels,
                                        n_ft, n)
        p_loss, p_acc = holdout_metrics(tuned, images_u8, labels, n_ft, n)
        return {
            "global_loss": g_loss,
            "global_accuracy": g_acc,
            "personalized_loss": p_loss,
            "personalized_accuracy": p_acc,
            "n_holdout": (n - n_ft).astype(jnp.int32),
        }

    return personalize


def evaluate_personalization(
    engine,
    finetune_epochs: int = 1,
    finetune_fraction: float = 0.8,
) -> Dict[str, object]:
    # compiled-program cache lives on the engine: jit's cache is keyed on
    # callable identity, so rebuilding the closure per call would
    # recompile the full vmapped fine-tune program every invocation
    # (the monitoring use is "every N rounds")
    """Run the personalization protocol over every client of a
    :class:`~fl_tpu.orchestration.round_engine.FederatedRoundEngine` at its
    current global model.

    One compiled program; under a mesh the per-client work runs
    device-local via ``shard_map`` (no collectives — personalization is
    embarrassingly client-parallel). Returns per-client arrays plus
    sample-weighted means (weighting by each client's holdout size, so the
    aggregate is the accuracy over the pooled holdout set).
    """
    import numpy as np

    from fl_tpu.core import prng

    C = engine.num_clients
    cache = getattr(engine, "_personalization_cache", None)
    if cache is None:
        cache = engine._personalization_cache = {}
    run = cache.get((finetune_epochs, finetune_fraction))
    if run is None:
        fn = make_personalization_fn(
            engine.model, engine.config.training,
            samples_per_client=engine.data.samples_per_client,
            mean=engine.data.mean, std=engine.data.std,
            finetune_epochs=finetune_epochs,
            finetune_fraction=finetune_fraction,
        )

        def batch(variables, images, labels, num_samples, keys):
            stacked = jax.tree.map(
                lambda x: jnp.broadcast_to(
                    x[None], (images.shape[0],) + x.shape),
                variables)
            return jax.vmap(fn)(stacked, images, labels, num_samples, keys)

        if engine.mesh is not None:
            from jax.sharding import PartitionSpec as P

            axis = engine.mesh.axis_names[0]
            rep, csh = P(), P(axis)
            run = jax.jit(jax.shard_map(
                batch, mesh=engine.mesh,
                in_specs=(rep, csh, csh, csh, csh),
                out_specs=csh,
                check_vma=False,
            ))
        else:
            run = jax.jit(batch)
        cache[(finetune_epochs, finetune_fraction)] = run

    pkey = prng.stream_key(
        prng.round_key(engine._root_key, jnp.int32(engine.round_number)),
        prng.Stream.PERSONALIZE)
    keys = jax.vmap(lambda i: jax.random.fold_in(pkey, i))(
        jnp.arange(C, dtype=jnp.uint32))
    out = run(engine.global_variables, engine.data.images,
              engine.data.labels, engine.data.num_samples, keys)
    out = {k: np.asarray(v) for k, v in out.items()}

    w = out["n_holdout"].astype(np.float64)
    w = w / max(w.sum(), 1.0)
    summary = {
        f"mean_{k}": float((out[k] * w).sum())
        for k in ("global_accuracy", "personalized_accuracy",
                  "global_loss", "personalized_loss")
    }
    summary["mean_personalization_gain"] = (
        summary["mean_personalized_accuracy"]
        - summary["mean_global_accuracy"])
    return {"per_client": out, **summary}
