"""Vertical (feature-partitioned) federated learning — SplitNN-style.

Every other engine in fl_tpu is HORIZONTAL: clients hold different
*examples* of the same feature space. Vertical FL is the complementary
family (Yang et al. 2019 §2.2; Vepakomma et al. 2018 "Split learning"):
K parties hold different *features* of the SAME examples (bank + retailer
+ insurer, each with its own columns about shared customers), and one
party — the label party — holds the labels. Raw features never leave a
party; the only exchanged tensors are the **cut activations** (forward)
and the **cut gradients** (backward).

Architecture: party k owns a bottom tower ``x_k → Dense(hidden) → relu →
Dense(cut_dim)``; the label party owns the top model ``concat(cuts) →
relu → Dense(hidden) → relu → Dense(classes)``. The forward/backward of
all parties is ONE jitted XLA program (simulation of the deployment
message flow, exactly as the horizontal engines simulate theirs), with the
cut tensors surfaced so the engine can (a) account the exchanged bytes per
step, (b) optionally perturb the cut (``cut_noise_std`` — a defense
EXPERIMENT knob for reconstruction attacks at the cut; it is NOT a
certified DP mechanism and is documented as such).

Batching note (TPU): vertical FL is sample-aligned — every step consumes
the same example indices at every party — so the whole K-party step is a
handful of dense GEMMs; an epoch is one ``lax.scan`` over batches with
zero host round-trips.

The reference has no vertical/split capability (horizontal-only,
src/simulation/federated_simulation.py) — fl_tpu capability extension.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fl_tpu.core import prng


@dataclasses.dataclass(frozen=True)
class VerticalConfig:
    learning_rate: float = 1e-3
    batch_size: int = 64
    hidden: int = 128
    cut_dim: int = 32
    # Gaussian noise added to each party's cut activations during training
    # (forward); an experiment knob for cut-reconstruction defenses —
    # NOT a certified DP mechanism (no sensitivity bound on activations)
    cut_noise_std: float = 0.0
    seed: int = 0


def split_features(x: np.ndarray, parts: int) -> List[np.ndarray]:
    """Column-split a (N, D) feature matrix into ``parts`` contiguous
    blocks (the canonical vertical partition); images are flattened
    first."""
    x = np.asarray(x)
    n = x.shape[0]
    flat = x.reshape(n, -1)
    return [np.ascontiguousarray(b) for b in
            np.array_split(flat, parts, axis=1)]


def _init_params(key, sizes: Sequence[Tuple[int, int]]) -> List[Dict]:
    out = []
    for i, (din, dout) in enumerate(sizes):
        k = jax.random.fold_in(key, i)
        out.append({
            "w": (jax.random.normal(k, (din, dout), jnp.float32)
                  * np.sqrt(1.0 / din)),
            "b": jnp.zeros((dout,), jnp.float32),
        })
    return out


class VerticalFLEngine:
    """K-party SplitNN trainer over feature-partitioned data.

    ``feature_splits``: list of (N, d_k) float arrays — party k's columns,
    row-aligned across parties. ``labels``: (N,) int — held by the label
    party (party 0 by convention).
    """

    def __init__(self, feature_splits: Sequence[np.ndarray],
                 labels: np.ndarray, num_classes: int,
                 config: VerticalConfig = VerticalConfig(),
                 test_splits: Optional[Sequence[np.ndarray]] = None,
                 test_labels: Optional[np.ndarray] = None):
        if len(feature_splits) < 2:
            raise ValueError("vertical FL needs >= 2 parties (one party "
                             "owning every column is centralized training)")
        n = feature_splits[0].shape[0]
        for i, s in enumerate(feature_splits):
            if s.ndim != 2 or s.shape[0] != n:
                raise ValueError(
                    f"party {i} features must be (N, d_k) row-aligned: "
                    f"got {s.shape}, N={n}")
        if len(labels) != n:
            raise ValueError("labels must align with the feature rows")
        self.cfg = config
        self.num_parties = len(feature_splits)
        self.num_classes = int(num_classes)
        self.features = [jnp.asarray(s, jnp.float32)
                         for s in feature_splits]
        self.labels = jnp.asarray(labels, jnp.int32)
        self.n = n
        self._test = None
        if test_splits is not None:
            self._test = ([jnp.asarray(s, jnp.float32)
                           for s in test_splits],
                          jnp.asarray(test_labels, jnp.int32))

        key = prng.root_key(config.seed)
        c = config
        self.bottom_params = [
            _init_params(jax.random.fold_in(key, 100 + k),
                         [(self.features[k].shape[1], c.hidden),
                          (c.hidden, c.cut_dim)])
            for k in range(self.num_parties)
        ]
        top_in = c.cut_dim * self.num_parties
        self.top_params = _init_params(
            jax.random.fold_in(key, 999),
            [(top_in, c.hidden), (c.hidden, self.num_classes)])
        self.optimizer = optax.adam(c.learning_rate)
        self.opt_state = self.optimizer.init(
            (self.bottom_params, self.top_params))
        self.epoch = 0
        self._epoch_fn = None
        self._eval_fn = None

    # -- model pieces -------------------------------------------------------
    @staticmethod
    def _bottom(params, x):
        h = jnp.maximum(x @ params[0]["w"] + params[0]["b"], 0.0)
        return h @ params[1]["w"] + params[1]["b"]

    @staticmethod
    def _top(params, cut, num_classes):
        h = jnp.maximum(cut, 0.0)
        h = jnp.maximum(h @ params[0]["w"] + params[0]["b"], 0.0)
        return h @ params[1]["w"] + params[1]["b"]

    def _loss(self, all_params, xb_parts, yb, noise_key):
        bottoms, top = all_params
        cuts = [self._bottom(bottoms[k], xb_parts[k])
                for k in range(self.num_parties)]
        if self.cfg.cut_noise_std > 0:
            cuts = [c + self.cfg.cut_noise_std
                    * jax.random.normal(jax.random.fold_in(noise_key, k),
                                        c.shape)
                    for k, c in enumerate(cuts)]
        cut = jnp.concatenate(cuts, axis=1)
        logits = self._top(top, cut, self.num_classes)
        logp = jax.nn.log_softmax(logits)
        loss = -jnp.take_along_axis(logp, yb[:, None], axis=1).mean()
        acc = (jnp.argmax(logits, -1) == yb).mean()
        return loss, acc

    # -- one epoch as one program -------------------------------------------
    def _build(self):
        c = self.cfg
        steps = max(1, self.n // c.batch_size)

        # data enters as ARGUMENTS (not closure captures): captured arrays
        # are baked into the compiled program as literals, which bloats
        # the executable at dataset scale
        def epoch_fn(all_params, opt_state, epoch_idx, features, labels):
            ekey = prng.round_key(prng.root_key(c.seed), epoch_idx)
            perm = jax.random.permutation(
                prng.stream_key(ekey, prng.Stream.SHUFFLE), self.n)

            def step(carry, s):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice(
                    perm, (s * c.batch_size,), (c.batch_size,))
                xb = [jnp.take(f, idx, axis=0) for f in features]
                yb = jnp.take(labels, idx, axis=0)
                nkey = jax.random.fold_in(
                    prng.stream_key(ekey, prng.Stream.DP_NOISE), s)
                (loss, acc), grads = jax.value_and_grad(
                    self._loss, has_aux=True)(params, xb, yb, nkey)
                updates, opt_state = self.optimizer.update(
                    grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, acc)

            (all_params, opt_state), (losses, accs) = jax.lax.scan(
                step, (all_params, opt_state), jnp.arange(steps))
            return all_params, opt_state, losses.mean(), accs.mean()

        self._epoch_fn = jax.jit(epoch_fn)

        def eval_fn(all_params, xparts, y):
            bottoms, top = all_params
            cuts = [self._bottom(bottoms[k], xparts[k])
                    for k in range(self.num_parties)]
            logits = self._top(top, jnp.concatenate(cuts, axis=1),
                               self.num_classes)
            logp = jax.nn.log_softmax(logits)
            return {
                "loss": -jnp.take_along_axis(
                    logp, y[:, None], axis=1).mean(),
                "accuracy": (jnp.argmax(logits, -1) == y).mean(),
            }

        self._eval_fn = jax.jit(eval_fn)

    def run_epoch(self) -> Dict[str, float]:
        if self._epoch_fn is None:
            self._build()
        params = (self.bottom_params, self.top_params)
        (self.bottom_params, self.top_params), self.opt_state, loss, acc = \
            self._epoch_fn(params, self.opt_state,
                           jnp.asarray(self.epoch, jnp.int32),
                           self.features, self.labels)
        self.epoch += 1
        return {"epoch": self.epoch - 1, "train_loss": float(loss),
                "train_accuracy": float(acc)}

    def evaluate(self) -> Dict[str, float]:
        if self._test is None:
            raise ValueError("no test split configured")
        if self._eval_fn is None:
            self._build()
        out = self._eval_fn((self.bottom_params, self.top_params),
                            self._test[0], self._test[1])
        return {k: float(v) for k, v in out.items()}

    # -- communication accounting --------------------------------------------
    def exchanged_bytes_per_step(self) -> int:
        """Wire bytes per SGD step in a deployment: each non-label party
        ships its (B, cut_dim) f32 activations and receives the same-shaped
        gradient; the label party's own cut never crosses the wire."""
        per_party = 2 * self.cfg.batch_size * self.cfg.cut_dim * 4
        return (self.num_parties - 1) * per_party

    def exchanged_bytes_per_epoch(self) -> int:
        return (self.n // self.cfg.batch_size) \
            * self.exchanged_bytes_per_step()

    def raw_feature_bytes(self) -> int:
        """What centralizing the non-label parties' raw columns would cost
        (the thing vertical FL avoids) — for the accounting comparison."""
        return int(sum(int(np.prod(f.shape)) * 4
                       for f in self.features[1:]))
