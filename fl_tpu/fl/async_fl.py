"""Asynchronous federated learning with buffered aggregation (FedBuff).

Synchronous FedAvg rounds run at the pace of the slowest participant; real
cross-device fleets are wildly heterogeneous, so production systems
aggregate ASYNCHRONOUSLY: each client trains from whatever global version
it last downloaded, finished updates land in a buffer, and every K
arrivals the server folds the buffer into the newest model with a
staleness discount — FedBuff (Nguyen et al. 2022, "Federated Learning
with Buffered Asynchronous Aggregation").

TPU-native formulation. A faithful async simulation does NOT need
interleaved execution: a client's trajectory depends only on (start
model, shard, per-attempt PRNG), so its training can be *deferred to its
completion event* and computed there, bit-identically to a truly
concurrent run. The engine therefore keeps

- a device-resident **ring buffer of the last B global versions** (one
  stacked pytree), and
- a host-side event queue of sampled client completion times
  (capability-keyed lognormal service times — the analog of the
  reference's cycled LOW/MED/HIGH capability profiles,
  src/simulation/federated_simulation.py:247-249),

and runs ONE jitted superstep per server step: gather the K finished
clients' start versions from the ring (jnp.take on the version axis),
vmap local training over the K clients, staleness-weighted delta average,
apply to the newest model, push it into the ring. Under a mesh the K-way
client axis shards exactly like the sync engine's.

Staleness is bounded by the ring depth: a client whose start version has
been evicted (staleness > max_staleness) is cancelled and restarted from
the current model — the deployment-standard timeout policy, counted in
``cancelled_attempts``.

The reference is strictly synchronous (its coordinator blocks on
min_clients then aggregates, src/coordinator/grpc_server.py:209-214);
this is a capability extension. No DP composition is wired here — async
DP accounting (per-buffer release) is its own literature; use the sync
engine's DP modes when privacy is required.
"""

from __future__ import annotations

import dataclasses
import functools
import heapq
import time
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from fl_tpu.core import prng
from fl_tpu.core import pytree as pt
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
class AsyncConfig:
    """FedBuff knobs (defaults follow Nguyen et al. 2022 §5: K=10-ish
    buffers, polynomial staleness discount)."""

    training: FederatedTrainingConfig = dataclasses.field(
        default_factory=FederatedTrainingConfig)
    buffer_size: int = 8             # K: updates per server step
    max_staleness: int = 8           # ring keeps max_staleness+1 versions
    staleness_exponent: float = 0.5  # weight ∝ (1+s)^(-a); 0 = uniform
    sample_weighted: bool = False    # additionally weight by shard size
    server_lr: float = 1.0
    seed: int = 0
    # service-time model: client c's attempt duration is
    # speed_c · LogNormal(0, duration_sigma), with per-client speed_c
    # itself lognormal over the population (heterogeneity_sigma). Zero
    # sigmas = deterministic unit durations (useful for exactness tests).
    duration_sigma: float = 0.5
    heterogeneity_sigma: float = 1.0


@dataclasses.dataclass
class AsyncStepResult:
    server_step: int
    sim_time: float                  # simulated clock at aggregation
    client_ids: List[int]
    staleness: List[int]
    cancelled_attempts: int          # cumulative
    train_loss: float
    train_accuracy: float
    step_time_s: float


class AsyncFederatedEngine:
    """FedBuff over the same data layout as the synchronous engine."""

    def __init__(
        self,
        model: FLModel,
        data: "FederatedArrays",
        config: AsyncConfig,
        mesh=None,
    ):
        if config.buffer_size < 1:
            raise ValueError("buffer_size must be >= 1")
        if config.buffer_size > data.num_clients:
            raise ValueError(
                f"buffer_size={config.buffer_size} exceeds the client "
                f"population ({data.num_clients})")
        if config.max_staleness < 0:
            raise ValueError("max_staleness must be >= 0")
        self.model = model
        self.config = config
        self.mesh = mesh
        if mesh is not None and config.buffer_size % mesh.devices.size != 0:
            raise ValueError(
                f"buffer_size={config.buffer_size} must divide evenly "
                f"over the {mesh.devices.size}-device mesh")
        self.num_clients = data.num_clients
        self.data = data.to_device(
            mesh=None)  # gathered by client id; keep replicated
        self._root_key = prng.root_key(config.seed)
        self.global_variables: Variables = model.init(
            prng.stream_key(self._root_key, prng.Stream.INIT))

        # version ring: slot v % B holds global version v while it is
        # within max_staleness of the head
        self._ring_depth = config.max_staleness + 1
        self.ring: Variables = jax.tree.map(
            lambda x: jnp.broadcast_to(
                x[None], (self._ring_depth,) + x.shape).copy(),
            self.global_variables)
        self.version = 0             # newest global version
        self.server_step_count = 0
        self.cancelled_attempts = 0
        self.sim_time = 0.0

        # host event queue: (completion_time, client, start_version,
        # attempt). Every client is permanently in flight (continuous
        # participation, the FedBuff regime).
        host_rng = np.random.default_rng(config.seed)
        self._speed = np.exp(host_rng.normal(
            0.0, config.heterogeneity_sigma, self.num_clients))
        self._host_rng = host_rng
        self._attempts = np.zeros(self.num_clients, np.int64)
        self._queue: list = []
        for c in range(self.num_clients):
            heapq.heappush(self._queue,
                           (self._draw_duration(c), c, 0, 0))

        self._superstep = self._build_superstep()
        self._eval_fn = make_eval_fn(model)
        self.history: List[AsyncStepResult] = []

    # ------------------------------------------------------------------
    def _draw_duration(self, client: int) -> float:
        jitter = (np.exp(self._host_rng.normal(
            0.0, self.config.duration_sigma))
            if self.config.duration_sigma > 0 else 1.0)
        return float(self._speed[client] * jitter)

    # ------------------------------------------------------------------
    def _build_superstep(self):
        cfg = self.config
        data = self.data
        K = cfg.buffer_size
        a = float(cfg.staleness_exponent)
        local_train = make_local_train_fn(
            self.model, cfg.training,
            samples_per_client=data.samples_per_client,
            mean=data.mean, std=data.std, homogeneous_epochs=True)
        epochs = jnp.int32(cfg.training.local_epochs)

        def per_client(start_vars, images_u8, labels, n_valid, key):
            trained, metrics = local_train(
                start_vars, images_u8, labels, n_valid, epochs, key)
            return pt.tree_sub(trained, start_vars), metrics

        def body(ring, global_vars, slots, client_ids, staleness,
                 num_samples_all, keys, images_all, labels_all, psum_):
            starts = jax.tree.map(
                lambda l: jnp.take(l, slots, axis=0), ring)
            images = jnp.take(images_all, client_ids, axis=0)
            labels = jnp.take(labels_all, client_ids, axis=0)
            n_valid = jnp.take(num_samples_all, client_ids, axis=0)
            deltas, metrics = jax.vmap(per_client)(
                starts, images, labels, n_valid, keys)
            w = (1.0 + staleness.astype(jnp.float32)) ** (-a)
            if cfg.sample_weighted:
                w = w * n_valid.astype(jnp.float32)
            w = w / jnp.maximum(psum_(w.sum()), 1e-12)
            new_global = jax.tree.map(
                lambda g, d: (g + cfg.server_lr * psum_(jnp.tensordot(
                    w, d.astype(jnp.float32), axes=1))).astype(g.dtype),
                global_vars, deltas)
            out = {
                "train_loss": psum_((metrics["loss"] * w).sum()),
                "train_accuracy": psum_((metrics["accuracy"] * w).sum()),
            }
            return new_global, out

        if self.mesh is None:
            return jax.jit(functools.partial(body, psum_=lambda x: x))

        from jax.sharding import PartitionSpec as P

        axis = self.mesh.axis_names[0]
        rep, ksh = P(), P(axis)
        sharded = functools.partial(
            body, psum_=lambda x: jax.lax.psum(x, axis))
        return jax.jit(jax.shard_map(
            sharded, mesh=self.mesh,
            in_specs=(rep, rep, ksh, ksh, ksh, rep, ksh, rep, rep),
            out_specs=(rep, rep),
            check_vma=False,
        ))

    # ------------------------------------------------------------------
    def _pop_completions(self):
        """Pop K valid completions; cancel-and-restart evicted ones."""
        K = self.config.buffer_size
        out = []
        while len(out) < K:
            t_done, c, start_v, attempt = heapq.heappop(self._queue)
            self.sim_time = max(self.sim_time, t_done)
            if self.version - start_v > self.config.max_staleness:
                # start version evicted from the ring: cancel, restart
                # from the current model (deployment timeout policy)
                self.cancelled_attempts += 1
                self._attempts[c] += 1
                heapq.heappush(self._queue, (
                    t_done + self._draw_duration(c), c, self.version,
                    int(self._attempts[c])))
                continue
            out.append((c, start_v, attempt))
        return out

    def run_server_step(self) -> AsyncStepResult:
        t0 = time.time()
        completed = self._pop_completions()
        clients = np.asarray([c for c, _, _ in completed], np.int32)
        start_vs = np.asarray([v for _, v, _ in completed], np.int64)
        attempts = np.asarray([a for _, _, a in completed], np.int64)
        staleness = (self.version - start_vs).astype(np.int32)
        slots = (start_vs % self._ring_depth).astype(np.int32)

        # per-(client, attempt) keys — attempt plays the sync engine's
        # round role, so attempt-0 trajectories match sync round 0
        keys = np.stack([
            np.asarray(prng.client_key(
                prng.round_key(self._root_key, int(a)), int(c)))
            for c, a in zip(clients, attempts)])

        new_global, metrics = self._superstep(
            self.ring, self.global_variables, jnp.asarray(slots),
            jnp.asarray(clients), jnp.asarray(staleness),
            self.data.num_samples, jnp.asarray(keys),
            self.data.images, self.data.labels)

        self.global_variables = new_global
        self.version += 1
        slot = self.version % self._ring_depth
        self.ring = jax.tree.map(
            lambda r, g: r.at[slot].set(g.astype(r.dtype)),
            self.ring, new_global)

        # completed clients immediately start a fresh attempt from the
        # new model
        for c in clients:
            c = int(c)
            self._attempts[c] += 1
            heapq.heappush(self._queue, (
                self.sim_time + self._draw_duration(c), c, self.version,
                int(self._attempts[c])))

        result = AsyncStepResult(
            server_step=self.server_step_count,
            sim_time=float(self.sim_time),
            client_ids=clients.astype(int).tolist(),
            staleness=staleness.astype(int).tolist(),
            cancelled_attempts=int(self.cancelled_attempts),
            train_loss=float(metrics["train_loss"]),
            train_accuracy=float(metrics["train_accuracy"]),
            step_time_s=time.time() - t0,
        )
        self.server_step_count += 1
        self.history.append(result)
        return result

    def run(self, num_server_steps: int) -> List[AsyncStepResult]:
        return [self.run_server_step() for _ in range(num_server_steps)]

    # ------------------------------------------------------------------
    def evaluate(self, images: np.ndarray, labels: np.ndarray
                 ) -> Dict[str, Any]:
        from fl_tpu.fl.local_training import evaluate_test_set

        return evaluate_test_set(self._eval_fn, self.global_variables,
                                 images, labels, self.data.mean,
                                 self.data.std)
