"""Local client training as a pure, vmappable function.

Parity target: ``LocalTrainer`` + ``FederatedTrainingConfig`` +
``create_adaptive_config`` (src/shared/training.py). The reference's hot loop
(``_train_epoch``, training.py:173-212) is a Python for-loop over torch
DataLoader batches with per-batch host→device copies and ``.item()`` syncs;
here one client's full local-training run (all epochs × steps) is a nested
``lax.scan`` over a device-resident shard, and the *whole population* of
clients runs as ``vmap(local_train)`` — one XLA program, zero host traffic.

Key design points (SURVEY.md §7 hard parts):
- **Fixed trip counts**: epochs/steps are static; early stopping inside the
  local loop is replaced by fixed local epochs (as the reference's federated
  path effectively does — FederatedTrainer passes no early stopping).
- **Padded shards**: every client's shard is padded to a static length.
  Per-epoch shuffles draw a permutation of the padded length and remap
  out-of-range slots back into the valid region, so every batch is full of
  real samples and BatchNorm statistics stay clean.
- **Heterogeneous epochs** (capability adaptation, ref training.py:455-502):
  all clients run ``max_epochs`` scans; a per-client ``epochs`` array masks
  later epochs to no-ops, so LOW/MEDIUM/HIGH-power clients can coexist in one
  vmapped program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from fl_tpu.core import prng
from fl_tpu.models.base import FLModel, Variables
from fl_tpu.ops.rounding import stochastic_round_tree_bf16


@dataclasses.dataclass(frozen=True)
class FederatedTrainingConfig:
    """Local-training hyperparameters
    (ref: FederatedTrainingConfig, src/shared/training.py:406-453)."""

    local_epochs: int = 5
    batch_size: int = 32
    learning_rate: float = 0.001
    optimizer_type: str = "adam"  # adam | adamw | sgd (ref training.py:244-256)
    validation_split: float = 0.1
    early_stopping_patience: Optional[int] = None
    save_checkpoints: bool = True
    momentum: float = 0.9
    weight_decay: float = 1e-4
    # FedProx (Li et al. 2020): adds (μ/2)·‖w − w_global‖² to every local
    # step's loss, pulling heterogeneous clients toward the round's global
    # model. 0.0 = plain FedAvg local training.
    proximal_mu: float = 0.0
    # Storage dtype for Adam moments ("bfloat16" | None=f32). At C clients
    # the per-client m/v trees are the dominant HBM traffic of the
    # wgrad+Adam fusions (each a read+write of C·params floats per step);
    # bf16 storage halves it. Moment arithmetic stays f32 — only the
    # carried state is cast. Safe here because local opt state is
    # re-initialized every round and lives ~steps_per_round Adam steps,
    # far too few for bf16 EMA granularity loss (1-b2 < 2^-8) to bite.
    optimizer_state_dtype: Optional[str] = None
    # Storage dtype for the per-client param trees carried through the
    # local scan ("bfloat16" | None=f32). The C-replicated params are
    # read by fwd + dgrad and read+written by the Adam fusion every step;
    # bf16 storage halves that traffic. All arithmetic stays f32 (the
    # carried tree is upcast at step entry; XLA folds the bf16->f32->bf16
    # chain the compute-dtype cast would otherwise add), and the
    # f32 Adam result is written back with UNBIASED stochastic rounding
    # (fl_tpu.ops.rounding) so sub-ULP updates survive in expectation.
    # The external contract is unchanged: clients still return f32
    # params, and in DP mode rounding is post-processing of the already
    # clipped+noised gradients, so the (eps, delta) guarantee is intact.
    param_storage_dtype: Optional[str] = None

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "FederatedTrainingConfig":
        return cls(**{k: v for k, v in d.items()
                      if k in {f.name for f in dataclasses.fields(cls)}})


def create_adaptive_config(capabilities: Dict[str, Any]) -> FederatedTrainingConfig:
    """Capability→hyperparameter mapping, matching the reference table
    (src/shared/training.py:455-502): HIGH→(10 epochs, batch 64),
    MEDIUM→(5, 32), LOW→(3, 16, lr 5e-4); small datasets cap the batch,
    large ones double it; low bandwidth adds local epochs."""
    power = capabilities.get("compute_power", "medium")
    power = getattr(power, "value", power)  # accept the enum
    bandwidth = capabilities.get("network_bandwidth", 10)
    samples = capabilities.get("available_samples", 1000)

    if power == "high":
        epochs, batch, lr = 10, 64, 0.001
    elif power == "medium":
        epochs, batch, lr = 5, 32, 0.001
    else:
        epochs, batch, lr = 3, 16, 0.0005

    if samples < 500:
        batch = min(batch, 16)
    elif samples > 5000:
        batch = min(batch * 2, 128)

    if bandwidth < 5:
        epochs = max(epochs + 2, 7)

    return FederatedTrainingConfig(
        local_epochs=epochs, batch_size=batch, learning_rate=lr,
        optimizer_type="adam",
    )


def _scale_by_adam_stored(b1: float = 0.9, b2: float = 0.999,
                          eps: float = 1e-8,
                          state_dtype=jnp.bfloat16) -> optax.GradientTransformation:
    """`optax.scale_by_adam` with BOTH moments stored in ``state_dtype``.

    optax's ``mu_dtype`` only casts the first moment; at 512 clients the
    second-moment tree is just as much HBM traffic (the round-3 profile
    puts the fc1 wgrad+Adam fusion at ~80% of HBM peak, ~5 GB/step —
    docs/performance.md). Arithmetic is f32 (EMA update, bias correction,
    rsqrt); only the carried state is cast down.
    """

    def init_fn(params):
        z = lambda p: jnp.zeros(jnp.shape(p), dtype=state_dtype)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(z, params), nu=jax.tree.map(z, params))

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        f32 = jnp.float32
        mu = jax.tree.map(
            lambda m, g: b1 * m.astype(f32) + (1 - b1) * g.astype(f32),
            state.mu, updates)
        nu = jax.tree.map(
            lambda v, g: b2 * v.astype(f32)
            + (1 - b2) * jnp.square(g.astype(f32)),
            state.nu, updates)
        c1 = 1.0 - b1 ** count.astype(f32)
        c2 = 1.0 - b2 ** count.astype(f32)
        new_updates = jax.tree.map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu, nu)
        cast = lambda t: jax.tree.map(  # noqa: E731
            lambda a: a.astype(state_dtype), t)
        return new_updates, optax.ScaleByAdamState(
            count=count, mu=cast(mu), nu=cast(nu))

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: FederatedTrainingConfig) -> optax.GradientTransformation:
    """Optimizer factory (ref: _create_optimizer, src/shared/training.py:244-256)."""
    state_dtype = (jnp.dtype(cfg.optimizer_state_dtype)
                   if cfg.optimizer_state_dtype else None)
    if cfg.optimizer_type == "adam":
        if state_dtype is not None:
            return optax.chain(_scale_by_adam_stored(state_dtype=state_dtype),
                               optax.scale(-cfg.learning_rate))
        return optax.adam(cfg.learning_rate)
    if cfg.optimizer_type == "adamw":
        if state_dtype is not None:
            return optax.chain(_scale_by_adam_stored(state_dtype=state_dtype),
                               optax.add_decayed_weights(cfg.weight_decay),
                               optax.scale(-cfg.learning_rate))
        return optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
    if cfg.optimizer_type == "sgd":
        return optax.sgd(cfg.learning_rate, momentum=cfg.momentum)
    raise ValueError(f"Unknown optimizer: {cfg.optimizer_type}")


def cross_entropy_loss(logits: jax.Array, labels: jax.Array,
                       reduce: bool = True) -> jax.Array:
    """Softmax cross-entropy, mean-reduced by default (ref uses
    nn.CrossEntropyLoss, training.py:56); ``reduce=False`` returns the
    per-example vector (for masked means over padded shards)."""
    per = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return per.mean() if reduce else per


def make_local_train_fn(
    model: FLModel,
    cfg: FederatedTrainingConfig,
    samples_per_client: int,
    mean: jnp.ndarray,
    std: jnp.ndarray,
    max_epochs: Optional[int] = None,
    augment_fn: Optional[Callable] = None,
    dp_sgd_fn: Optional[Callable] = None,
    homogeneous_epochs: bool = False,
    scaffold: bool = False,
    grad_mask=None,
    traced_lr: bool = False,
) -> Callable:
    """Build the single-client local-training function.

    Returns ``local_train(variables, images_u8, labels, n_valid, epochs, rng)
    -> (new_variables, metrics)`` where

    - ``variables``: the client's model variables (broadcast global model)
    - ``images_u8``: (N, H, W, C) uint8 shard (padded; HBM-resident)
    - ``labels``: (N,) int32
    - ``n_valid``: scalar int32 true sample count
    - ``epochs``: scalar int32 ≤ max_epochs — per-client epoch budget
    - ``rng``: per-client, per-round PRNG key

    vmap this over the leading client axis of every argument to get the
    whole-population trainer. With ``scaffold=True`` the function takes a
    seventh argument ``correction`` (a params-shaped f32 tree, the
    client's SCAFFOLD control-variate correction ``c - c_i``) added to
    every step's gradient (fl_tpu.fl.scaffold). ``dp_sgd_fn``, when given, replaces the
    per-step gradient with a per-example-clipped noised one (see
    fl_tpu.fl.privacy); its first argument receives None — the plain batch
    gradient is never computed in DP mode (metrics come from a
    forward-only pass).

    ``traced_lr=True`` makes the learning rate a TRACED per-call argument
    (keyword ``lr``) instead of a compile-time constant, so one compiled
    program can train clients at different rates (vmap over ``lr`` — the
    federated HPO sweep, fl_tpu.fl.hpo). Exactness: in every optimizer
    here (sgd/adam/adamw as optax builds them) the accumulator state
    evolves independently of the learning rate and the final update is
    LINEAR in it, so the optimizer is built at lr=1 and the update scaled
    by the traced value — bit-identical math to a statically-built
    optimizer at that lr.

    ``homogeneous_epochs=True`` promises every client runs exactly
    ``max_epochs`` epochs, which removes the three per-step masked
    tree-selects (params / mutable vars / optimizer state) that implement
    heterogeneous epoch budgets — at 512 clients x 422K params those
    selects stream ~2.6 GB of HBM per tree per step, a measurable slice of
    the round budget. The caller (round engine) enables it automatically
    when no per-client budgets are configured.
    """
    if max_epochs is None:
        max_epochs = cfg.local_epochs
    batch = cfg.batch_size
    steps_per_epoch = max(1, samples_per_client // batch)
    if traced_lr:
        import dataclasses as _dc

        optimizer = make_optimizer(_dc.replace(cfg, learning_rate=1.0))
    else:
        optimizer = make_optimizer(cfg)
    if cfg.param_storage_dtype not in (None, "bfloat16"):
        raise ValueError(
            f"param_storage_dtype must be None or 'bfloat16', got "
            f"{cfg.param_storage_dtype!r}")
    store_bf16 = cfg.param_storage_dtype == "bfloat16"
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def normalize(x_u8: jax.Array) -> jax.Array:
        return (x_u8.astype(jnp.float32) / 255.0 - mean) / std

    def loss_fn(params, extra_vars, xb, yb, dropout_key):
        variables = {"params": params, **extra_vars}
        logits, new_vars = model.apply(
            variables, xb, train=True, dropout_rng=dropout_key
        )
        loss = cross_entropy_loss(logits, yb)
        acc = (jnp.argmax(logits, -1) == yb).mean()
        new_extra = {k: v for k, v in new_vars.items() if k != "params"}
        return loss, (acc, new_extra)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    mu = float(cfg.proximal_mu)

    def local_train(variables, images_u8, labels, n_valid, epochs, rng,
                    correction=None, lr=None):
        if scaffold and correction is None:
            raise TypeError("scaffold=True local_train needs the "
                            "correction argument")
        if traced_lr and lr is None:
            raise TypeError("traced_lr=True local_train needs the lr "
                            "argument")
        lr_mul = jnp.asarray(lr, jnp.float32) if traced_lr else None
        params = variables["params"]
        global_params = params  # round-start global model (FedProx anchor)
        extra0 = {k: v for k, v in variables.items() if k != "params"}

        # TPU gathers are pathological on 1-byte types (the per-step u8
        # batch take measured 4.7 GB/s, the single off-roofline op in the
        # ghost profile — docs/performance.md). Pack 4 pixels per u32
        # word once, gather words, bitcast back: exact same bytes, 4x
        # fewer gathered elements.
        img_shape = images_u8.shape[1:]
        px = 1
        for d in img_shape:
            px *= d
        if images_u8.dtype == jnp.uint8 and px % 4 == 0:
            packed = jax.lax.bitcast_convert_type(
                images_u8.reshape(images_u8.shape[0], px // 4, 4),
                jnp.uint32)

            def take_images(idx):
                words = jnp.take(packed, idx, axis=0)      # (B, px/4)
                return jax.lax.bitcast_convert_type(
                    words, jnp.uint8).reshape((idx.shape[0],) + img_shape)
        else:
            def take_images(idx):
                return jnp.take(images_u8, idx, axis=0)
        opt_state = optimizer.init(params)
        if store_bf16:
            srk = prng.stream_key(rng, prng.Stream.ROUNDING)
            sr_seed0 = (srk[0] ^ srk[1]).astype(jnp.uint32)
            params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
        shuffle_key = prng.stream_key(rng, prng.Stream.SHUFFLE)
        dropout_key = prng.stream_key(rng, prng.Stream.DROPOUT)
        augment_key = prng.stream_key(rng, prng.Stream.AUGMENT)
        n = jnp.maximum(n_valid.astype(jnp.int32), 1)

        def epoch_body(carry, epoch_idx):
            params, extra, opt_state = carry
            ekey = jax.random.fold_in(shuffle_key, epoch_idx)
            perm_raw = jax.random.permutation(ekey, samples_per_client)
            # remap padded slots into the valid region (keeps batches dense)
            perm = jnp.where(perm_raw < n, perm_raw, perm_raw % n)
            active = epoch_idx < epochs  # heterogeneous epoch budgets

            def step_body(carry, step_idx):
                params, extra, opt_state = carry
                # f32 view for all arithmetic; storage may be bf16
                p32 = (jax.tree.map(lambda p: p.astype(jnp.float32), params)
                       if store_bf16 else params)
                idx = jax.lax.dynamic_slice(perm, (step_idx * batch,), (batch,))
                xb = normalize(take_images(idx))
                yb = jnp.take(labels, idx, axis=0)
                if augment_fn is not None:
                    akey = jax.random.fold_in(
                        augment_key, epoch_idx * steps_per_epoch + step_idx
                    )
                    xb = augment_fn(xb, akey)
                dkey = jax.random.fold_in(
                    dropout_key, epoch_idx * steps_per_epoch + step_idx
                )
                if dp_sgd_fn is None:
                    (loss, (acc, new_extra)), grads = grad_fn(
                        p32, extra, xb, yb, dkey
                    )
                else:
                    # metrics come from a forward pass only — the plain
                    # batch gradient would be discarded (the DP transform
                    # recomputes with per-example clipping), so don't pay
                    # its backward
                    loss, (acc, new_extra) = loss_fn(
                        p32, extra, xb, yb, dkey
                    )
                    # DP-SGD batches must NOT remap padded slots onto real
                    # examples — a duplicated example would participate in
                    # several noised contributions per epoch (and up to
                    # twice in one batch), exceeding the accounted
                    # sensitivity/q. Instead padded slots are masked to a
                    # zero contribution: each real example then lands in
                    # exactly one uniformly-random slot per epoch, so the
                    # per-step inclusion probability is exactly
                    # batch/samples_per_client — the q the accountant uses.
                    idx_raw = jax.lax.dynamic_slice(
                        perm_raw, (step_idx * batch,), (batch,)
                    )
                    wmask = (idx_raw < n).astype(jnp.float32)
                    grads = dp_sgd_fn(
                        None, p32, extra, xb, yb, wmask, dkey,
                        jax.random.fold_in(
                            prng.stream_key(rng, prng.Stream.DP_NOISE),
                            epoch_idx * steps_per_epoch + step_idx,
                        ),
                    )
                if scaffold:
                    # SCAFFOLD control-variate correction c - c_i
                    # (constant over the round, added to every step's
                    # gradient — Karimireddy et al. 2020 Alg. 1 line 10)
                    grads = jax.tree.map(
                        lambda g, cc: g + cc.astype(g.dtype),
                        grads, correction)
                if mu > 0.0:
                    # FedProx proximal gradient μ·(w − w_global): exactly
                    # the gradient of (μ/2)·‖w − w_global‖². Data-
                    # independent, so in DP mode adding it after the
                    # clipped+noised gradient does not change sensitivity.
                    grads = jax.tree.map(
                        lambda g, p, gp: g + mu * (p - gp),
                        grads, p32, global_params)
                if grad_mask is not None:
                    # parameter freezing (fl_tpu.fl.peft): applied LAST so
                    # no gradient addend (DP noise, SCAFFOLD, proximal)
                    # leaks into frozen leaves — masked grads give zero
                    # Adam moments / SGD velocity, hence EXACTLY-zero
                    # updates and bit-stable frozen params
                    grads = jax.tree.map(
                        lambda g, m: g * m.astype(g.dtype),
                        grads, grad_mask)
                updates, new_opt = optimizer.update(grads, opt_state, p32)
                if traced_lr:
                    # optimizer built at lr=1; the update is linear in lr
                    updates = jax.tree.map(
                        lambda u: u * lr_mul.astype(u.dtype), updates)
                new_params = optax.apply_updates(p32, updates)
                if store_bf16:
                    ctr = (epoch_idx * steps_per_epoch
                           + step_idx).astype(jnp.uint32)
                    new_params = stochastic_round_tree_bf16(
                        new_params, sr_seed0 + ctr * jnp.uint32(0x9E3779B9))
                if homogeneous_epochs:
                    params, extra, opt_state = new_params, new_extra, new_opt
                else:
                    # masked no-op for clients whose epoch budget is spent
                    params = jax.tree.map(
                        lambda new, old: jnp.where(active, new, old),
                        new_params, params)
                    extra = jax.tree.map(
                        lambda new, old: jnp.where(active, new, old),
                        new_extra, extra)
                    opt_state = jax.tree.map(
                        lambda new, old: jnp.where(active, new, old),
                        new_opt, opt_state)
                return (params, extra, opt_state), (loss, acc)

            (params, extra, opt_state), (losses, accs) = jax.lax.scan(
                step_body, (params, extra, opt_state),
                jnp.arange(steps_per_epoch),
            )
            return (params, extra, opt_state), (losses.mean(), accs.mean())

        (params, extra, opt_state), (ep_loss, ep_acc) = jax.lax.scan(
            epoch_body, (params, extra0, opt_state), jnp.arange(max_epochs)
        )
        if store_bf16:  # external contract: clients return f32 params
            params = jax.tree.map(lambda p: p.astype(jnp.float32), params)
        # report metrics of the last *active* epoch
        last = jnp.clip(epochs - 1, 0, max_epochs - 1)
        metrics = {
            "loss": ep_loss[last],
            "accuracy": ep_acc[last],
            "epochs_completed": epochs.astype(jnp.int32),
            "samples_processed": (epochs * steps_per_epoch * batch).astype(jnp.int32),
        }
        return {"params": params, **extra}, metrics

    # callers (round engine: SCAFFOLD k_steps; metrics) must use the
    # trainer's own step count, not re-derive it
    local_train.steps_per_epoch = steps_per_epoch
    return local_train


def evaluate_test_set(eval_fn: Callable, variables: Variables,
                      images_u8, labels, mean, std) -> Dict[str, float]:
    """Normalize a uint8 test set on host and run a ``make_eval_fn``
    program — the shared evaluate() body of the clustered / async /
    hierarchical engines (one definition so preprocessing can never
    drift between them)."""
    import numpy as np

    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    x = jnp.asarray((np.asarray(images_u8, np.float32) / 255.0 - mean)
                    / std)
    m = eval_fn(variables, x, jnp.asarray(labels, jnp.int32))
    return {"loss": float(m["loss"]), "accuracy": float(m["accuracy"])}


def make_eval_fn(model: FLModel, batch_size: int = 512) -> Callable:
    """Jitted full-dataset evaluation (ref: evaluate_model,
    src/shared/training.py:307-360 — loss, accuracy, per-class accuracy)."""

    @jax.jit
    def eval_fn(variables: Variables, images: jax.Array, labels: jax.Array):
        n = images.shape[0]
        bs = min(batch_size, n)
        n_batches = max(1, n // bs)
        usable = n_batches * bs
        xs = images[:usable].reshape((n_batches, bs) + images.shape[1:])
        ys = labels[:usable].reshape((n_batches, bs))

        def body(carry, xy):
            xb, yb = xy
            logits, _ = model.apply(variables, xb, train=False)
            loss = cross_entropy_loss(logits, yb)
            pred = jnp.argmax(logits, -1)
            correct = (pred == yb)
            num_classes = logits.shape[-1]
            onehot = jax.nn.one_hot(yb, num_classes)
            per_class_correct = (correct[:, None] * onehot).sum(0)
            per_class_total = onehot.sum(0)
            return carry, (loss, correct.mean(), per_class_correct, per_class_total)

        _, (losses, accs, pcc, pct) = jax.lax.scan(body, None, (xs, ys))
        per_class = pcc.sum(0) / jnp.maximum(pct.sum(0), 1.0)
        return {
            "loss": losses.mean(),
            "accuracy": accs.mean(),
            "per_class_accuracy": per_class,
        }

    return eval_fn
