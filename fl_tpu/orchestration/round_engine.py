"""The federated round engine: one FedAvg round = one XLA program.

This is the TPU-native replacement for the reference's entire round data
path (SURVEY.md §3.2-3.4): instead of N client threads each doing
download-model → local-train → DP → serialize → gRPC → coordinator
deserialize → per-layer averaging (with torch.save/hex round trips on every
hop), the **superstep** below runs

    broadcast(θ_g) → vmap(local SGD over C clients) → Δ clip+noise (DP) →
    sample-weighted FedAvg reduction → new θ_g (+ on-device eval norms)

as a single jitted function over HBM-resident client shards. With a device
mesh the client axis is sharded (fl_tpu.core.mesh) and the FedAvg reduction
lowers to an ICI all-reduce; single-chip it is one fused HBM reduction.

The Python round loop stays on host (it is control-plane only: convergence
detection, participation/straggler masks from the failure handler, metrics,
checkpointing) — the reference's coordinator logic, minus its thread zoo.
"""

from __future__ import annotations

import dataclasses
import logging
import math
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fl_tpu.core import prng
from fl_tpu.core import pytree as pt
from fl_tpu.core.mesh import client_sharding, replicated
from fl_tpu.core.types import PrivacyConfig
from fl_tpu.data.federated import FederatedArrays
from fl_tpu.fl import fedavg as fa
from fl_tpu.fl import privacy as dp
from fl_tpu.fl.convergence import ConvergenceDetector, RoundObservation
from fl_tpu.fl.local_training import (
    FederatedTrainingConfig,
    make_eval_fn,
    make_local_train_fn,
)
from fl_tpu.models.base import FLModel, Variables

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class RoundEngineConfig:
    """Round-level knobs (ref defaults: config/coordinator.yaml:9-13 +
    grpc_server.py:453-463 — min 2 / max 50 clients, 5 local epochs,
    batch 32, lr 1e-3, 300 s timeout)."""

    training: FederatedTrainingConfig = dataclasses.field(
        default_factory=FederatedTrainingConfig
    )
    min_clients: int = 2
    max_clients: int = 50
    # DP: "none"
    #   | "delta"     reference semantics: per-client delta clip + noise
    #   | "dp_sgd"    per-example clipping inside every local step
    #   | "client_dp" client-level DP-FedAvg: clip client deltas to C,
    #                 uniform mean, central noise σ = z·C/m on the aggregate,
    #                 RDP-accounted with q = participation rate per round
    #   | "distributed" distributed DP (fl.distributed_dp): each client
    #                 quantizes its clipped delta to an integer grid and
    #                 adds its own Skellam noise share; only the int32
    #                 MODULAR sum is decoded, so the release is private
    #                 before the server sees it and composes bit-exactly
    #                 with mod-2^32 secure aggregation. noise_multiplier z
    #                 calibrates the central noise like client_dp;
    #                 Skellam-RDP-accounted at realized participant counts
    #                 (q=1 — no subsampling amplification claimed)
    dp_mode: str = "none"
    privacy: Optional[PrivacyConfig] = None
    epsilon_per_round: Optional[float] = None  # default: privacy.epsilon
    delta_per_round: Optional[float] = None
    participation_rate: float = 1.0
    straggler_dropout_rate: float = 0.0
    seed: int = 0
    # aggregate BatchNorm statistics with the same FedAvg weights (FedBN-avg)
    aggregate_batch_stats: bool = True
    compute_dtype: str = "float32"  # "bfloat16" for MXU-friendly local math
    # DP noise via the fused Pallas kernel (None = auto: TPU && no mesh;
    # under a mesh the jnp path is used so XLA can shard the client axis)
    use_pallas_dp: Optional[bool] = None
    # DP-SGD per-example-grad chunk size: peak memory is
    # clients × dp_microbatch × |params| (see fl.privacy.make_dp_sgd_grad_fn)
    dp_microbatch: int = 16
    # DP-SGD implementation: "auto" uses ghost-norm clipping (two batched
    # backwards, no per-example grad trees — fl.privacy
    # make_ghost_dp_sgd_grad_fn) when the model is instrumented for it,
    # else the microbatched per-example path. "ghost" forces it (errors if
    # unsupported); "microbatch" forces the reference formulation.
    dp_sgd_impl: str = "auto"
    # ε accountant for dp_sgd/client_dp: "rdp" (moments, cheap per-round
    # queries) | "pld" (privacy-loss distribution, fl.pld — certifies the
    # same run ~10-15% tighter, so a PLD-calibrated z is smaller at the
    # same ε target). Under "pld" the budget gate precomputes the maximal
    # PLD-certified step count (pessimistic coarse grid) and enforces it
    # exactly; the RDP ledger keeps running for per-round diagnostics.
    accountant: str = "rdp"
    # PLD discretization for the budget gate. None = auto-sized per query
    # (fl.pld.suggest_pld_dt — the round-up slack accumulates linearly
    # over composed steps, so the grid must scale as ε/steps). Callers
    # that calibrated z through calibrate_noise_multiplier_pld should
    # pass the SAME suggest_pld_dt(ε, planned_steps) value here so the
    # gate provably admits the calibrated step count.
    pld_dt: Optional[float] = None
    # server-side optimizer on the FedAvg pseudo-gradient (Reddi et al.
    # 2021): "none" (plain FedAvg replacement, the reference behavior) |
    # "fedavgm" | "fedadam" | "fedyogi" — see fl.server_optimizer
    server_optimizer: str = "none"
    server_lr: float = 1.0
    server_momentum: float = 0.9
    server_b1: float = 0.9
    server_b2: float = 0.99
    server_eps: float = 1e-3
    # secure aggregation: pairwise additive masking (SecAgg-style ring
    # graph) so the aggregator only ever sees masked per-client payloads —
    # see fl.secure_agg. Composes with the DP modes.
    secure_aggregation: bool = False
    secure_agg_neighbors: int = 8
    secure_agg_scale: float = 1.0
    # lossy uplink compression simulated inside the superstep, with error
    # feedback carried across rounds (fl.uplink): "none" | "int8" | "topk".
    # Models the bandwidth-limited deployment uplink on-chip; EF state is
    # one (C, D) f32 matrix (client-sharded under a mesh).
    uplink_compression: str = "none"
    uplink_topk_ratio: float = 0.01  # fraction of coords kept per client
    # "powersgd": rank of the low-rank factorization (Vogels et al. 2019);
    # per-client warm-started Q factors ride in the same uplink-state
    # buffer as the EF residual (fl.powersgd)
    uplink_powersgd_rank: int = 4
    # Byzantine-robust aggregation (fl.robust_agg): "fedavg" (default,
    # sample-weighted mean) | "trimmed_mean" | "median" | "krum". Robust
    # aggregators combine participant deltas UNWEIGHTED (sample counts are
    # attacker-controlled) and are mutually exclusive with
    # secure_aggregation (the server must see real updates to score them)
    # and with client_dp (which owns its aggregation).
    aggregation: str = "fedavg"
    trim_k: int = 1       # trimmed_mean: drop k highest + k lowest per coord
    krum_f: int = 1       # krum: tolerated Byzantine count
    krum_m: int = 1       # multi-krum: how many lowest-score updates to avg
    # adaptive clipping (Andrew et al. 2021): with dp_mode="client_dp",
    # track the clip norm to the clip_quantile-quantile of client delta
    # norms via a DP-noised clipped-count indicator. The RDP accounting is
    # UNCHANGED — the count release is paid for by slightly inflating the
    # aggregate noise (fl.privacy.adaptive_clip_delta_multiplier, Thm 1).
    # privacy.max_grad_norm becomes the INITIAL clip norm.
    # Deployment surface: SIMULATION/ON-CHIP ONLY — the gRPC coordinator
    # wires delta-mode (reference parity) and distributed-DP; a wire
    # deployment of client_dp adaptive clipping would additionally need
    # the b_t indicator in the update message. Treat results as sim
    # results until then.
    adaptive_clipping: bool = False
    clip_quantile: float = 0.5    # γ: target quantile of client delta norms
    clip_lr: float = 0.2          # η_C: geometric-update learning rate
    clip_count_stddev: Optional[float] = None  # σ_b; default m̄/20 (paper §5)
    # privacy-audit injection (client_dp only): lets designated clients
    # submit an EXPLICIT delta in place of their trained one, flowing
    # through the production clip→aggregate→noise path unchanged. Used by
    # fl_tpu.validation.audit to run update-canary membership audits
    # (Steinke et al. 2023) against the very superstep production runs.
    audit_injection: bool = False
    # DP-FTRL (Kairouz et al. 2021, fl.dp_ftrl): dp_mode="dp_ftrl" gives
    # client-level DP for ARBITRARY participation patterns (no Poisson
    # sampling assumption) via binary-tree noisy prefix sums. privacy.
    # noise_multiplier is the effective Gaussian multiplier z of the
    # whole-transcript release; ε is certified once up front
    # (gaussian_epsilon(z, δ)) and must fit privacy.epsilon.
    ftrl_rounds: Optional[int] = None     # T_max: tree size (required)
    # Tree nonce: node noise is regenerated from fold_in(key, nonce), so
    # two trees sharing a nonce share noise — differencing their released
    # prefix sums would cancel it and void the guarantee. None (default)
    # draws fresh OS entropy per engine; set explicitly ONLY to reproduce
    # one specific run, never to "continue" a finished tree.
    ftrl_tree_nonce: Optional[int] = None
    ftrl_max_participations: int = 1      # k: per-client round budget
    ftrl_momentum: float = 0.9            # β of DP-FTRLM (0 = plain)
    ftrl_cohort_size: Optional[int] = None  # m̄; default q*N rounded
    ftrl_server_lr: float = 1.0           # η of the FTRL server step
    # downlink (broadcast) compression: "none" | "bfloat16" | "int8".
    # The server ships a lossily-compressed global model θ̂ (per-leaf
    # symmetric int8 or a bf16 cast — halves/quarters the broadcast
    # bytes); clients train FROM θ̂ and return deltas measured AGAINST θ̂,
    # which the server applies to its FULL-PRECISION master θ — the
    # master never absorbs quantization error (invariant: zero local
    # work ⇒ θ bit-unchanged). Composes with the uplink path (opposite
    # direction) and with delta/dp_sgd/client_dp (the DP release is
    # computed from what clients actually trained on); robust/secure
    # aggregation and dp_ftrl/scaffold own their delta plumbing and are
    # refused.
    downlink_compression: str = "none"
    # FedNova normalized averaging (Wang et al. 2020): with heterogeneous
    # local work (per-client epoch budgets from capability adaptation),
    # plain FedAvg optimizes an inconsistent objective biased toward
    # clients that took more local steps. FedNova divides each client's
    # delta by its effective step count a_i (for SGD-with-momentum ρ:
    # a_i = [τ_i − ρ(1−ρ^τ_i)/(1−ρ)]/(1−ρ); plain SGD: a_i = τ_i) and
    # rescales by τ_eff = Σ p_i a_i, recovering the consistent objective.
    # Requires optimizer_type="sgd" (a_i is an SGD-trajectory identity),
    # no FedProx/SCAFFOLD (their a_i differs), aggregation="fedavg", and
    # dp_mode in ("none", "delta") — delta-mode noise is a per-client
    # local release, so reweighting it is DP post-processing.
    fednova: bool = False
    # SCAFFOLD control variates (Karimireddy et al. 2020, fl.scaffold):
    # corrects client drift by adding (c - c_i) to every local SGD step's
    # gradient. Requires plain SGD local steps (Option II identity),
    # dp_mode="none", and no secure aggregation. Control state is a
    # (C, D) client-sharded matrix + (D,) replicated vector, carried
    # across rounds and checkpointed like the uplink EF state.
    scaffold: bool = False
    # distributed-DP grid resolution: γ = max_grad_norm / 2^dist_bits.
    # Larger bits shrink both the quantization error and the relative
    # stochastic-rounding sensitivity inflation √d/2^bits, at the cost of
    # larger Poisson rates in the on-chip Skellam sampler; 14 keeps the
    # inflation ≈4% at SimpleCNN scale (d≈422k) with int32 headroom for
    # thousands of clients (checked at config time).
    dist_bits: int = 14
    # fuse the per-client Skellam shares into ONE aggregate draw on the
    # summed vector — EXACTLY the same distribution (Skellam closure:
    # Σ_m Sk(μ/m̄) = Sk(m·μ/m̄)) for everything the engine releases, at
    # 2·D Poisson draws instead of 2·C·D (measured: per-client sampling
    # halved round throughput at 512 clients). Set False to simulate the
    # per-client noised payloads themselves (what wire clients transmit).
    dist_fuse_noise: bool = True
    # parameter-efficient fine-tuning (fl.peft): regex patterns over the
    # flax param paths; only matching leaves train (frozen leaves get
    # EXACTLY-zero updates, so their FedAvg deltas are zero and the
    # frozen region of the global model is bit-stable across rounds).
    # Pair with models.FederatedViT(lora_rank=r) and
    # fl.peft.lora_trainable_patterns() for LoRA federated fine-tuning.
    # Composes with every dp_mode (masking is gradient post-processing;
    # accounting stays conservative on the full tree); drift correctors
    # (scaffold/fednova/feddyn) assume full-dimension trajectories and
    # are refused.
    trainable_patterns: Optional[Tuple[str, ...]] = None
    # FedDyn dynamic regularization (Acar et al. 2021, fl.feddyn): each
    # client minimizes L_i(θ) − ⟨g_i, θ⟩ + (α/2)‖θ − θ_g‖² — the linear
    # term rides the trainer's correction operand, the quadratic IS
    # FedProx's proximal hook with μ=α (injected; keep proximal_mu=0).
    # State: per-client g_i (C, D) client-sharded + server h (D,)
    # replicated, carried across rounds and checkpointed. 0.0 = off.
    feddyn_alpha: float = 0.0
    # q-FFL fair federated learning (Li et al. 2020, fl.qffl): reweight
    # the round toward badly-served clients. Each client's delta is
    # scaled by F_k(θ̂)^q (its loss at the RECEIVED model, evaluated
    # before local training inside the same superstep) and the step is
    # normalized by the paper's h_k estimate so the learning rate need
    # not be re-tuned as q changes. q = 0.0 is exactly uniform FedAvg;
    # q in [1, 5] is the paper's fairness range. None (default) = off.
    # The weights depend on raw local losses (an unprivatized,
    # data-dependent release), so q-FFL requires dp_mode="none" and no
    # secure aggregation; it owns the server step (h-normalized), so
    # server_optimizer/fednova/scaffold/feddyn are refused.
    qffl_q: Optional[float] = None


@dataclasses.dataclass
class RoundResult:
    round_number: int
    train_loss: float
    train_accuracy: float
    test_loss: Optional[float]
    test_accuracy: Optional[float]
    convergence_score: float
    participating_clients: int
    round_time_s: float
    epsilon_spent: float = 0.0
    clip_norm: Optional[float] = None  # adaptive clipping: C used this round


@dataclasses.dataclass
class _PendingRound:
    """A dispatched-but-not-yet-finalized round (run_rounds_pipelined).

    Holds the device handles and host bookkeeping captured at dispatch
    time so the metrics readback (and the ledger entry whose metadata
    needs those metrics) can happen one round later without changing
    sequential semantics."""

    round_number: int
    mask: np.ndarray
    t0: float
    metrics: Dict[str, Any]
    variables: Variables
    eps_spent: float
    round_clip: Optional[float]
    ledger: Optional[Callable[[Dict[str, Any]], None]]


class FederatedRoundEngine:
    """Owns the jitted superstep and the host round loop."""

    def __init__(
        self,
        model: FLModel,
        data: FederatedArrays,
        config: RoundEngineConfig,
        mesh=None,
        test_images: Optional[np.ndarray] = None,
        test_labels: Optional[np.ndarray] = None,
        augment_fn: Optional[Callable] = None,
    ):
        self.model = model
        self.config = config
        self.mesh = mesh
        self.num_clients = data.num_clients
        if mesh is not None and self.num_clients % mesh.devices.size != 0:
            raise ValueError(
                f"num_clients={self.num_clients} must divide evenly over the "
                f"{mesh.devices.size}-device mesh; pad the client count "
                "(fl_tpu.core.mesh.pad_to_multiple) — surplus slots can be "
                "masked out of participation"
            )

        # device placement: client-stacked leaves sharded over the mesh,
        # global model replicated
        self.data = data.to_device(mesh)
        if mesh is not None:
            self._client_sh = client_sharding(mesh)
            self._rep_sh = replicated(mesh)
        else:
            self._client_sh = self._rep_sh = None

        # per-client epoch budgets (capability adaptation hook; default flat)
        self._epochs_per_client = np.full(
            (self.num_clients,), config.training.local_epochs, np.int32
        )

        self._root_key = prng.root_key(config.seed)
        self._np_rng = np.random.default_rng(config.seed + 1)

        # feature-composition validation: the declarative matrix
        # (fl_tpu.orchestration.features) runs every unary and pairwise
        # refusal rule in the original order; a new feature family that
        # doesn't declare its row fails tests/test_feature_matrix.py
        from fl_tpu.orchestration.features import validate_config

        validate_config(config, self.num_clients)

        # privacy bookkeeping (host ledger; noise itself is on-device)
        self.privacy = config.privacy
        if config.dp_mode != "none" and self.privacy is None:
            raise ValueError(f"dp_mode={config.dp_mode!r} requires a PrivacyConfig")
        self.budget_tracker = (
            dp.PrivacyBudgetTracker(self.privacy.epsilon, self.privacy.delta)
            if self.privacy else None
        )
        self.accountant = dp.PrivacyAccountant()
        # DP-SGD mode carries a proper RDP (moments) accountant: ε is
        # computed from the subsampled-Gaussian composition, not the naive
        # additive ledger (fl_tpu.fl.accounting)
        self.rdp_accountant = None
        if config.dp_mode in ("dp_sgd", "client_dp", "distributed"):
            from fl_tpu.fl.accounting import RDPAccountant

            self.rdp_accountant = RDPAccountant()
        # PLD budget gate state: max steps certified under ε, steps taken
        self._pld_max_steps: Optional[int] = None
        self._pld_steps_taken: int = 0

        # DP-FTRL setup: certify the whole-transcript ε up front and
        # freeze the tree geometry (sensitivity depends on T_max and k)
        self._ftrl_eps_total = None
        if config.dp_mode == "dp_ftrl":
            from fl_tpu.fl import dp_ftrl as ftrl

            z = self.privacy.noise_multiplier
            eps_total = ftrl.gaussian_epsilon(z, self.privacy.delta)
            if eps_total > self.privacy.epsilon + 1e-9:
                raise dp.PrivacyError(
                    f"dp_ftrl at z={z} certifies ε={eps_total:.3f} > "
                    f"budget ε={self.privacy.epsilon}; raise "
                    "noise_multiplier (fl_tpu.fl.dp_ftrl."
                    "calibrate_noise_multiplier gives the smallest "
                    "sufficient z)")
            self._ftrl_eps_total = eps_total
            self._ftrl_height = ftrl.tree_height(config.ftrl_rounds)
            k = config.ftrl_max_participations
            self._ftrl_sigma_node = (
                z * self.privacy.max_grad_norm
                * math.sqrt(k * self._ftrl_height))
            self._ftrl_cohort = (
                config.ftrl_cohort_size
                if config.ftrl_cohort_size is not None
                else max(1, round(config.participation_rate
                                  * self.num_clients)))
            nonce = config.ftrl_tree_nonce
            if nonce is None:
                import os as _os

                nonce = int.from_bytes(_os.urandom(8), "little")
            self._ftrl_nonce = int(nonce) & 0xFFFFFFFFFFFFFFFF
            self._ftrl_tree_key = jax.random.fold_in(
                jax.random.fold_in(
                    prng.stream_key(self._root_key, prng.Stream.DP_NOISE),
                    np.uint32(self._ftrl_nonce & 0xFFFFFFFF)),
                np.uint32(self._ftrl_nonce >> 32))

        # adaptive clipping (Andrew et al. 2021) — client_dp only: the
        # quantile indicator is computed on the centrally-visible pre-clip
        # norms, and its DP cost is folded into the central noise
        self.clip_norm: Optional[float] = None
        self._clip_count_stddev: Optional[float] = None
        if config.adaptive_clipping:
            m_bar = max(1.0, config.participation_rate * self.num_clients)
            self._clip_count_stddev = (
                config.clip_count_stddev
                if config.clip_count_stddev is not None
                else m_bar / 20.0)
            # validates feasibility (needs 2σ_b > z) — raises PrivacyError
            dp.adaptive_clip_delta_multiplier(
                self.privacy.noise_multiplier, self._clip_count_stddev)
            self.clip_norm = float(self.privacy.max_grad_norm)

        self._zero_injection = None  # built lazily on first run_round

        # parameter freezing (fl.peft): the grad mask needs the param
        # structure, so init the variables up front and reuse them below
        self._grad_mask = None
        self._init_variables = None
        if config.trainable_patterns:
            from fl_tpu.fl.peft import count_trainable, trainable_mask

            self._init_variables = model.init(
                prng.stream_key(self._root_key, prng.Stream.INIT))
            self._grad_mask = trainable_mask(
                self._init_variables["params"], config.trainable_patterns)
            tr, tot = count_trainable(self._grad_mask)
            logger.info("parameter freezing: %d/%d params trainable "
                        "(%.1f%%)", tr, tot, 100.0 * tr / max(tot, 1))

        self._augment_fn = augment_fn
        self._built_homogeneous: Optional[bool] = None
        self._build_pipeline()

        # server-side optimizer on the FedAvg pseudo-gradient (see
        # fl_tpu.fl.server_optimizer; "none" = reference behavior)
        from fl_tpu.fl.server_optimizer import (
            make_server_optimizer,
            make_server_update_fn,
        )

        self._server_opt = make_server_optimizer(
            config.server_optimizer, learning_rate=config.server_lr,
            momentum=config.server_momentum, b1=config.server_b1,
            b2=config.server_b2, eps=config.server_eps,
        )
        self._server_update = (make_server_update_fn(self._server_opt)
                               if self._server_opt is not None else None)
        self.server_opt_state = None
        self._eval_fn = make_eval_fn(model) if test_images is not None else None
        if test_images is not None:
            self.test_images = jnp.asarray(test_images)
            self.test_labels = jnp.asarray(test_labels)
        else:
            self.test_images = self.test_labels = None

        self.round_number = 0
        self.global_variables: Variables = (
            self._init_variables if self._init_variables is not None
            else model.init(
                prng.stream_key(self._root_key, prng.Stream.INIT))
        )
        if config.dp_mode == "dp_sgd" and "batch_stats" in self.global_variables:
            raise ValueError(
                "dp_sgd with BatchNorm is unsound: batch statistics couple "
                "examples, so the per-example gradients DP-SGD clips are "
                "ill-defined. Use a per-example normalization, e.g. "
                "create_model('cifar10_cnn', norm='group')."
            )
        if config.feddyn_alpha > 0 and "batch_stats" in self.global_variables:
            raise ValueError(
                "feddyn's server model θ ← mean θ_i − h/α is defined on "
                "params only (Acar et al. 2021 has no BN treatment); use "
                "a stats-free model, e.g. create_model('cifar10_cnn', "
                "norm='group')."
            )
        if config.qffl_q is not None and "batch_stats" in self.global_variables:
            raise ValueError(
                "q-FFL's server step θ ← θ − ΣΔ_k/Σh_k is defined on "
                "params only (Li et al. 2020 has no BN treatment); use "
                "a stats-free model, e.g. create_model('cifar10_cnn', "
                "norm='group')."
            )
        # distributed-DP plan: static sensitivity/noise parameters derived
        # from the model's REAL flat dim; certified against int32
        # wraparound up front
        self._dist_plan = None
        if config.dp_mode == "distributed":
            from fl_tpu.fl import distributed_dp as ddp
            from fl_tpu.ops.flatten import flat_dim as _fdim

            m_bar = max(1, round(config.participation_rate
                                 * self.num_clients))
            self._dist_plan = ddp.DistributedDPPlan(
                clip_norm=float(self.privacy.max_grad_norm),
                bits=config.dist_bits,
                dim=_fdim(self.global_variables, batched=False),
                expected_clients=m_bar,
                noise_multiplier=float(self.privacy.noise_multiplier),
            )
            ddp.check_no_wraparound(self._dist_plan, self.num_clients)

        # uplink error-feedback state: (C, D_pad) f32 when compression is
        # on, a (C, 1) zero dummy otherwise (keeps the superstep arity and
        # shardings static)
        from fl_tpu.ops.flatten import flat_dim, padded_dim

        ef_d = (padded_dim(flat_dim(self.global_variables, batched=False))
                if config.uplink_compression != "none" else 1)
        self._powersgd_plan = None
        if config.uplink_compression == "powersgd":
            # PowerSGD packs its warm-started per-client Q factors into the
            # same flat state buffer, after the EF region (fl.powersgd):
            # superstep arity / sharding / checkpointing stay unchanged
            from fl_tpu.fl.powersgd import (
                init_uplink_state,
                make_powersgd_plan,
            )

            self._powersgd_plan = make_powersgd_plan(
                self.global_variables, config.uplink_powersgd_rank)
            ef = init_uplink_state(
                prng.stream_key(self._root_key, prng.Stream.UPLINK_Q),
                self._powersgd_plan, self.num_clients)
        else:
            ef = jnp.zeros((self.num_clients, ef_d), jnp.float32)
        if mesh is not None:
            ef = jax.device_put(ef, self._client_sh)
        self.uplink_error = ef
        # SCAFFOLD control-variate state: server c (D,) replicated +
        # client c_i (C, D) client-sharded; zero-init (paper Alg. 1), so
        # the mean(c_i) == c invariant holds from round 0
        sc_d = (padded_dim(flat_dim(self.global_variables["params"],
                                    batched=False))
                if config.scaffold else 1)
        sc_c = jnp.zeros((sc_d,), jnp.float32)
        sc_ci = jnp.zeros((self.num_clients, sc_d), jnp.float32)
        if mesh is not None:
            sc_c = jax.device_put(sc_c, self._rep_sh)
            sc_ci = jax.device_put(sc_ci, self._client_sh)
        self.scaffold_c, self.scaffold_ci = sc_c, sc_ci
        # FedDyn state: server h (D,) replicated + client g_i (C, D)
        # client-sharded; zero-init (paper Alg. 1)
        fd_d = (padded_dim(flat_dim(self.global_variables["params"],
                                    batched=False))
                if config.feddyn_alpha > 0 else 1)
        fd_h = jnp.zeros((fd_d,), jnp.float32)
        fd_g = jnp.zeros((self.num_clients, fd_d), jnp.float32)
        if mesh is not None:
            fd_h = jax.device_put(fd_h, self._rep_sh)
            fd_g = jax.device_put(fd_g, self._client_sh)
        self.feddyn_h, self.feddyn_grads = fd_h, fd_g
        # DP-FTRL mechanism state: true clipped-sum prefix, last released
        # noisy prefix, momentum buffer — all (D,) replicated — plus the
        # host-side per-client participation ledger enforcing k
        if config.dp_mode == "dp_ftrl":
            fd = padded_dim(flat_dim(self.global_variables["params"],
                                     batched=False))
            zeros = jnp.zeros((fd,), jnp.float32)
            if mesh is not None:
                zeros = jax.device_put(zeros, self._rep_sh)
            self.ftrl_cumsum = zeros
            self.ftrl_prev_noisy = zeros
            self.ftrl_momentum_buf = zeros
            self.ftrl_participations = np.zeros((self.num_clients,),
                                                np.int64)
            if "batch_stats" in self.global_variables:
                logger.warning(
                    "dp_ftrl freezes batch_stats at their init values "
                    "(only params flow through the DP release); prefer a "
                    "GroupNorm model, e.g. create_model('cifar10_cnn', "
                    "norm='group')")
        self.history: List[RoundResult] = []
        self.detector = ConvergenceDetector()
        self._fused_rounds_fn = None

    # ------------------------------------------------------------------
    # the superstep
    # ------------------------------------------------------------------
    def _is_homogeneous(self) -> bool:
        return bool(np.all(self._epochs_per_client
                           == self.config.training.local_epochs))

    @property
    def epochs_per_client(self) -> np.ndarray:
        """Per-client epoch budgets (capability adaptation). Assigning an
        array with heterogeneous budgets rebuilds the superstep with masked
        per-step selects; a flat array rebuilds the cheaper static path.
        Returns a read-only view: in-place writes would bypass both the
        validation and the pipeline rebuild — assign a whole array."""
        view = self._epochs_per_client.view()
        view.flags.writeable = False
        return view

    @epochs_per_client.setter
    def epochs_per_client(self, value) -> None:
        value = np.asarray(value, np.int32)
        if value.shape != (self.num_clients,):
            raise ValueError(
                f"epochs_per_client must have shape ({self.num_clients},), "
                f"got {value.shape}")
        if np.any(value > self.config.training.local_epochs):
            raise ValueError(
                "per-client epoch budgets cannot exceed "
                f"training.local_epochs={self.config.training.local_epochs}")
        self._epochs_per_client = value
        if self._is_homogeneous() != self._built_homogeneous:
            self._build_pipeline()

    def _build_pipeline(self) -> None:
        """(Re)build the vmapped local trainer + jitted superstep.

        Called from __init__ and when epoch-budget homogeneity flips: with
        flat budgets the local trainer drops the three per-step masked
        tree-selects (params / mutable vars / optimizer state), which stream
        several GB of HBM per step at the 512-client bench scale.
        """
        config, model = self.config, self.model

        # DP-SGD per-step grad transform (per-example clip + noise)
        dp_sgd_fn = None
        if config.dp_mode == "dp_sgd":
            from fl_tpu.fl.local_training import cross_entropy_loss
            from fl_tpu.fl.privacy import (
                make_ghost_dp_sgd_grad_fn,
                model_supports_ghost_dp,
            )

            impl = config.dp_sgd_impl
            if impl not in ("auto", "ghost", "microbatch"):
                raise ValueError(f"dp_sgd_impl={impl!r} not in "
                                 "('auto', 'ghost', 'microbatch')")
            if impl == "ghost" and not model_supports_ghost_dp(model):
                raise ValueError(
                    f"dp_sgd_impl='ghost' but model {model.name!r} lacks the "
                    "DP_LAYERS instrumentation contract")
            use_ghost = (impl == "ghost"
                         or (impl == "auto"
                             and model_supports_ghost_dp(model)))
            if use_ghost:
                base = make_ghost_dp_sgd_grad_fn(
                    model, self.privacy.max_grad_norm,
                    self.privacy.noise_multiplier,
                )
            else:
                def loss_fn(params, extra, xb, yb, dkey):
                    variables = {"params": params, **extra}
                    logits, _ = model.apply(variables, xb, train=True,
                                            dropout_rng=dkey)
                    return cross_entropy_loss(logits, yb), None

                base = dp.make_dp_sgd_grad_fn(
                    loss_fn, self.privacy.max_grad_norm,
                    self.privacy.noise_multiplier,
                    microbatch_size=config.dp_microbatch,
                )

            def dp_sgd_fn(grads, params, extra, xb, yb, wmask, dkey, nkey):
                del grads  # recomputed with per-example clipping
                return base(params, extra, xb, yb, wmask, dkey, nkey)

        homogeneous = self._is_homogeneous()
        train_cfg = config.training
        if config.feddyn_alpha > 0:
            # FedDyn's (α/2)‖θ − θ_g‖² term IS the FedProx proximal hook
            train_cfg = dataclasses.replace(
                train_cfg, proximal_mu=config.feddyn_alpha)
        self._local_train = make_local_train_fn(
            model,
            train_cfg,
            samples_per_client=self.data.samples_per_client,
            mean=self.data.mean,
            std=self.data.std,
            augment_fn=self._augment_fn,
            dp_sgd_fn=dp_sgd_fn,
            homogeneous_epochs=homogeneous,
            # enables the per-client correction operand (SCAFFOLD's c−c_i
            # or FedDyn's −g_i linear term)
            scaffold=config.scaffold or config.feddyn_alpha > 0,
            grad_mask=self._grad_mask,
        )
        self._built_homogeneous = homogeneous

        if self.mesh is not None:
            # shard_map over the client axis: per-client work (local
            # training, DP noise, uplink) is FORCED device-local and the
            # FedAvg reduction is an explicit psum — the only collective.
            # (The previous GSPMD `in_shardings` formulation let the
            # partitioner guess, and it guessed badly: the compiled HLO
            # contained six per-step all-gathers of client-folded conv
            # weights/activations — GSPMD cannot partition the grouped-conv
            # lowering of vmapped per-client convs along the group axis —
            # see scripts/audit_mesh_collectives.py.)
            from jax.sharding import PartitionSpec as P

            axis = self.mesh.axis_names[0]
            n_shards = self.mesh.devices.size
            fn = self._build_superstep(axis=axis, n_shards=n_shards)
            cfg_ = self.config
            rep, csh = P(), P(axis)
            mspec = {
                "train_loss": rep, "train_accuracy": rep,
                "weight_change_norm": rep, "weight_norm": rep,
                "client_loss": csh, "client_accuracy": csh,
            }
            if cfg_.dp_mode in ("delta", "client_dp", "dp_ftrl",
                                "distributed"):
                mspec["dp_sigma_mean"] = rep
            if cfg_.adaptive_clipping:
                mspec["next_clip_norm"] = rep
                mspec["clip_fraction"] = rep
            if cfg_.uplink_compression != "none":
                mspec["uplink_ef_norm"] = rep
            if cfg_.qffl_q is not None:
                mspec["client_pre_loss"] = csh
            in_specs = (rep, rep, csh, csh, csh, csh, csh, csh)
            if cfg_.adaptive_clipping:
                in_specs = in_specs + (rep,)
            if cfg_.audit_injection:
                # flags (C,) + injected-delta pytree, both client-sharded
                # (a single spec acts as a pytree prefix)
                in_specs = in_specs + (csh, csh)
            if cfg_.scaffold:
                in_specs = in_specs + (rep, csh)  # c (D,), c_i (C, D)
            if cfg_.feddyn_alpha > 0:
                in_specs = in_specs + (rep, csh)  # h (D,), g_i (C, D)
            if cfg_.dp_mode == "dp_ftrl":
                in_specs = in_specs + (rep, rep, rep)
            if cfg_.scaffold or cfg_.feddyn_alpha > 0:
                out_specs = (rep, csh, (rep, csh), mspec)
            elif cfg_.dp_mode == "dp_ftrl":
                out_specs = (rep, csh, (rep, rep, rep), mspec)
            else:
                out_specs = (rep, csh, mspec)
            self._superstep = jax.jit(jax.shard_map(
                fn, mesh=self.mesh,
                in_specs=in_specs,
                out_specs=out_specs,
                check_vma=False,
            ))
        else:
            self._superstep = jax.jit(self._build_superstep())
        self._fused_rounds_fn = None

    def _build_superstep(self, axis=None, n_shards=1):
        """Build the round superstep.

        With ``axis`` set the function is a *per-shard* body to be wrapped
        in ``jax.shard_map`` over that mesh axis: client-stacked arguments
        arrive as the local (C/n_shards)-client block, per-client math
        runs device-local, and cross-client reductions (FedAvg weighted
        sums, metric means) go through ``lax.psum``. Aggregators that
        mathematically need every client's update on every device
        (trimmed-mean/median/Krum sorts, ring-masked secure aggregation)
        ``all_gather`` the stacked deltas first — inherent to those
        algorithms, not a partitioning artifact.
        """
        cfg = self.config
        C = self.num_clients
        CL = C // n_shards if axis is not None else C  # local client block
        local_train = self._local_train
        dp_mode = cfg.dp_mode
        use_pallas_dp = cfg.use_pallas_dp
        if use_pallas_dp is None:
            from fl_tpu.ops.dp import on_tpu

            # auto: fused kernel on TPU, but NOT under a mesh. The
            # round-2 nested-shard_map kernel measured 3x slower end-to-end
            # on a 1-device mesh (2150 vs 698 ms/round): the extra
            # shard_map boundary inside the GSPMD program forced the
            # 864 MB (C, D) delta matrix to materialize in a fixed layout,
            # breaking fusions. Explicit use_pallas_dp=True still opts in
            # under a mesh (the kernel now runs directly inside the flat
            # shard_map superstep, no nested boundary).
            use_pallas_dp = on_tpu() and self.mesh is None

        def psum_(x):
            return x if axis is None else jax.lax.psum(x, axis)

        def gather_clients(tree):
            """(CL, ...) leaves -> full (C, ...) leaves on every shard."""
            if axis is None:
                return tree
            return jax.tree.map(
                lambda x: jax.lax.all_gather(
                    x, axis).reshape((C,) + x.shape[1:]),
                tree)
        if self.privacy is not None:
            eps_r = cfg.epsilon_per_round or self.privacy.epsilon
            del_r = cfg.delta_per_round or self.privacy.delta
            max_norm = self.privacy.max_grad_norm
        else:
            eps_r = del_r = max_norm = None

        uplink_kind = cfg.uplink_compression
        adaptive = cfg.adaptive_clipping
        scaffold = cfg.scaffold
        feddyn = cfg.feddyn_alpha > 0
        ftrl_on = dp_mode == "dp_ftrl"
        qffl = cfg.qffl_q is not None
        if qffl:
            # F_k(θ̂): masked eval-mode loss over each client's shard at
            # the model it received, computed INSIDE the superstep before
            # local training (one forward pass over the shard — small
            # next to local_epochs × the train loop)
            from fl_tpu.fl.federated_eval import make_federated_eval_fn

            qffl_eval = make_federated_eval_fn(
                self.model,
                samples_per_client=self.data.samples_per_client,
                mean=self.data.mean, std=self.data.std)
        downlink = cfg.downlink_compression
        if downlink == "int8":
            from fl_tpu.ops.quantize import (
                dequantize_affine,
                quantize_affine,
            )

            def downlink_ref(x):
                if not jnp.issubdtype(x.dtype, jnp.floating):
                    return x
                q, s, zp = quantize_affine(x, bits=8, symmetric=True)
                return dequantize_affine(
                    q, s, zp, symmetric=True).astype(x.dtype)
        elif downlink == "bfloat16":
            def downlink_ref(x):
                if not jnp.issubdtype(x.dtype, jnp.floating):
                    return x
                return x.astype(jnp.bfloat16).astype(x.dtype)
        # the trainer owns the step-count formula; SCAFFOLD's c_i
        # recovery divides by exactly the steps the trainer takes
        steps_per_epoch = self._local_train.steps_per_epoch
        # z_Δ: inflated aggregate noise so the count release is free w.r.t.
        # the accountant (Andrew et al. 2021 Thm 1; host-computed constant)
        z_delta = (dp.adaptive_clip_delta_multiplier(
            self.privacy.noise_multiplier, self._clip_count_stddev)
            if adaptive else None)

        def superstep(
            global_vars: Variables,
            round_idx: jax.Array,          # scalar int32
            mask: jax.Array,               # (C,) float32 participation mask
            epochs: jax.Array,             # (C,) int32 per-client epoch budget
            images: jax.Array,
            labels: jax.Array,
            num_samples: jax.Array,
            ef_state: jax.Array,           # (C, D) uplink error feedback
                                           # ((C, 1) dummy when disabled)
            *extra,                        # [clip_norm] if adaptive_clipping
                                           # + [inject_flags, inject_deltas]
                                           # if audit_injection
                                           # + [scaffold_c, scaffold_ci]
                                           # if scaffold
                                           # + [cumsum, prev_noisy, mom]
                                           # if dp_mode == "dp_ftrl"
        ):
            ei = 0
            clip_norm = None
            if adaptive:
                clip_norm = extra[ei]
                ei += 1
            inject_flags = inject_deltas = None
            if cfg.audit_injection:
                inject_flags, inject_deltas = extra[ei], extra[ei + 1]
                ei += 2
            sc_c = sc_ci = None
            if scaffold:
                sc_c, sc_ci = extra[ei], extra[ei + 1]
                ei += 2
            fd_h = fd_grads = None
            if feddyn:
                fd_h, fd_grads = extra[ei], extra[ei + 1]
                ei += 2
            ftrl_cumsum = ftrl_prev_noisy = ftrl_mom = None
            if ftrl_on:
                ftrl_cumsum, ftrl_prev_noisy, ftrl_mom = (
                    extra[ei], extra[ei + 1], extra[ei + 2])
                ei += 3
            if axis is None:
                keys = prng.client_round_keys(self._root_key, round_idx, C)
            else:
                # this shard's GLOBAL client ids — every client gets the
                # same key stream regardless of mesh shape
                rkey = prng.round_key(self._root_key, round_idx)
                ids = (jax.lax.axis_index(axis) * CL
                       + jnp.arange(CL, dtype=jnp.int32)).astype(jnp.uint32)
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(rkey, i))(ids)

            # θ̂: what clients actually receive. With downlink compression
            # every delta below is measured against ref_vars; the
            # aggregated delta is applied to the full-precision master.
            ref_vars = (jax.tree.map(downlink_ref, global_vars)
                        if downlink != "none" else global_vars)

            # broadcast the (possibly compressed) globals to a stacked
            # client axis
            stacked = jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (CL,) + x.shape),
                ref_vars
            )

            pre_losses = None
            if qffl:
                pre_losses = jax.vmap(qffl_eval)(
                    stacked, images, labels, num_samples)["loss"]

            if scaffold or feddyn:
                from fl_tpu.ops.flatten import (
                    stack_flatten,
                    stack_unflatten,
                )

                # spec of the stacked f32 params tree (static metadata;
                # the probe matrix itself is dead code XLA removes)
                _, sc_spec = stack_flatten(jax.tree.map(
                    lambda g: jnp.broadcast_to(
                        g[None].astype(jnp.float32), (CL,) + g.shape),
                    global_vars["params"]))
                if scaffold:
                    from fl_tpu.fl.scaffold import (
                        scaffold_correction,
                        scaffold_update,
                    )

                    corr = scaffold_correction(sc_c, sc_ci, sc_spec)
                else:
                    # FedDyn's −⟨g_i, θ⟩ term: constant per-step gradient
                    # addend −g_i (the proximal α-term is baked into the
                    # trainer via proximal_mu)
                    corr = stack_unflatten(-fd_grads, sc_spec)
                new_stacked, metrics = jax.vmap(local_train)(
                    stacked, images, labels, num_samples, epochs, keys, corr
                )
                # state updates from the RAW local trajectory (before any
                # uplink-compression distortion of the transmitted delta)
                d_mat, _ = stack_flatten(jax.tree.map(
                    lambda c, g: (c - g[None]).astype(jnp.float32),
                    new_stacked["params"], global_vars["params"]))
                if scaffold:
                    k_steps = epochs.astype(jnp.float32) * steps_per_epoch
                    sc_c_out, sc_ci_out = scaffold_update(
                        sc_c, sc_ci, d_mat, mask, k_steps,
                        cfg.training.learning_rate, C, psum_)
            else:
                new_stacked, metrics = jax.vmap(local_train)(
                    stacked, images, labels, num_samples, epochs, keys
                )

            if dp_mode == "delta":
                # reference semantics (federated_trainer.py:428-469):
                # noise the local-global delta, re-add to global — both
                # against θ̂, the model the client actually downloaded
                deltas = jax.tree.map(
                    lambda c, g: c - g[None], new_stacked, ref_vars
                )
                noisy_deltas, sens, sigma = dp.dp_noise_client_deltas(
                    deltas, keys, eps_r, del_r, max_norm,
                    use_pallas=use_pallas_dp,
                    # inside the shard_map body there is no nested mesh;
                    # per-client noise is already device-local
                    mesh=self.mesh if axis is None else None,
                )
                new_stacked = jax.tree.map(
                    lambda d, g: d + g[None], noisy_deltas, ref_vars
                )
                metrics = dict(metrics, dp_sensitivity=sens, dp_sigma=sigma)

            ef_out = ef_state
            if uplink_kind != "none":
                # simulate the bandwidth-limited uplink: each participant
                # transmits compress(delta + error), keeps the residual
                # (error feedback). Reference client order preserved:
                # train -> DP -> compress -> upload
                # (federated_trainer.py:267-501).
                from fl_tpu.fl.uplink import (
                    apply_uplink_with_error_feedback,
                    make_uplink_fn,
                )
                from fl_tpu.ops.flatten import (
                    flat_dim,
                    stack_flatten,
                    stack_unflatten,
                )

                up_deltas = jax.tree.map(
                    lambda c, g: (c - g[None]).astype(jnp.float32),
                    new_stacked, ref_vars,
                )
                mat, up_spec = stack_flatten(up_deltas)
                if uplink_kind == "powersgd":
                    from fl_tpu.fl.powersgd import (
                        apply_powersgd_with_error_feedback,
                    )

                    transmitted, ef_out = \
                        apply_powersgd_with_error_feedback(
                            mat, ef_state, mask, self._powersgd_plan
                        )
                else:
                    uplink_fn = make_uplink_fn(
                        uplink_kind, cfg.uplink_topk_ratio,
                        d_valid=flat_dim(up_deltas),  # top-k budget on the
                                                      # real dim, not pad
                    )
                    transmitted, ef_out = apply_uplink_with_error_feedback(
                        mat, ef_state, mask, uplink_fn
                    )
                hat = stack_unflatten(transmitted, up_spec)
                new_stacked = jax.tree.map(
                    lambda g, d: (g[None] + d).astype(g.dtype),
                    ref_vars, hat,
                )
                # EF-residual norm over the EF region only (for powersgd
                # the state buffer also carries the Q factors)
                ef_reg = ef_out[:, :mat.shape[1]]
                metrics = dict(
                    metrics,
                    uplink_ef_norm=psum_(jnp.sum(jnp.sqrt(
                        jnp.sum(ef_reg * ef_reg, axis=1)))) / C,
                )

            if dp_mode == "client_dp":
                # client-level DP-FedAvg: clip each participant's delta to C,
                # sum over participants divided by the FIXED expected
                # participant count m̄ = q·N (NOT the realized mask.sum() —
                # with a data-dependent denominator the add/remove
                # sensitivity would be ~2C/m and the certified ε understated
                # ~2×; McMahan et al. 2018 use the fixed q·N denominator so
                # each client's influence is exactly ≤ C/m̄), then central
                # Gaussian noise σ = z·C/m̄ — noise multiplier z w.r.t. the
                # true sensitivity, matching the Poisson-subsampled RDP
                # accounting at rate q.
                deltas = jax.tree.map(
                    lambda c, g: c - g[None], new_stacked, ref_vars
                )
                if cfg.audit_injection:
                    # audit canaries: replace flagged clients' deltas with
                    # the injected ones BEFORE the clip — the canary is a
                    # client like any other from the mechanism's viewpoint
                    deltas = jax.tree.map(
                        lambda d, inj: jnp.where(
                            inject_flags.reshape(
                                (CL,) + (1,) * (d.ndim - 1)) > 0,
                            inj.astype(d.dtype), d),
                        deltas, inject_deltas)
                cn = clip_norm if adaptive else max_norm
                clipped, pre_norms = dp.clip_client_deltas(deltas, cn)
                # m̄ uses the GLOBAL expected participant count q·N even
                # per-shard — the per-shard partial sums psum into the same
                # fixed-denominator mean
                m = jnp.float32(max(1.0, cfg.participation_rate * C))
                avg_delta = jax.tree.map(
                    lambda d: psum_(jnp.tensordot(
                        mask.astype(jnp.float32), d.astype(jnp.float32),
                        axes=1)) / m,
                    clipped,
                )
                z_eff = z_delta if adaptive else self.privacy.noise_multiplier
                sigma = (z_eff * cn) / m
                nkey = prng.stream_key(
                    prng.round_key(self._root_key, round_idx),
                    prng.Stream.DP_NOISE,
                )
                if adaptive:
                    # quantile tracking: DP-noised clipped fraction drives
                    # the geometric clip update (Andrew et al. 2021 Alg. 1).
                    # Distinct subkeys for aggregate vs count noise; the
                    # count noise is added once to the psum'd centered sum
                    # (replicated under a mesh — same key on every shard).
                    nkey, ckey = jax.random.split(nkey)
                    b = (pre_norms <= cn).astype(jnp.float32)
                    centered = psum_(jnp.sum(
                        mask.astype(jnp.float32) * (b - 0.5)))
                    frac = dp.noisy_clipped_fraction(
                        centered, m, self._clip_count_stddev, ckey)
                    next_cn = dp.geometric_clip_update(
                        cn, frac, cfg.clip_quantile, cfg.clip_lr)
                noisy_delta = dp.central_noise_tree(avg_delta, nkey, sigma)
                new_global = jax.tree.map(
                    lambda g, d: (g + d.astype(jnp.float32)).astype(g.dtype),
                    global_vars, noisy_delta,
                )
                metrics = dict(metrics,
                               dp_sigma=jnp.broadcast_to(sigma, (CL,)),
                               dp_sensitivity=pre_norms)
                if adaptive:
                    metrics = dict(metrics, next_clip_norm=next_cn,
                                   clip_fraction=frac)
            elif dp_mode == "distributed":
                # distributed DP (fl.distributed_dp): clip → γ-grid
                # stochastic rounding → per-client Skellam noise share →
                # int32 MODULAR sum — the only quantity ever decoded,
                # i.e. exactly what a mod-2^32 secure aggregator would
                # hand the server — divided by the FIXED expected count
                # (client_dp's sensitivity convention). Rounding/noise
                # keys derive from GLOBAL client ids so the release is
                # mesh-layout-invariant; per-shard partial sums psum in
                # int32, whose two's-complement wrap IS mod 2^32.
                from fl_tpu.fl import distributed_dp as ddp
                from fl_tpu.ops.flatten import (
                    stack_flatten,
                    stack_unflatten,
                )

                plan = self._dist_plan
                deltas = jax.tree.map(
                    lambda c, g: c - g[None], new_stacked, ref_vars)
                clipped, pre_norms = dp.clip_client_deltas(
                    deltas, plan.clip_norm)
                mat, spec = stack_flatten(clipped)
                dkeys = jax.vmap(lambda k: jax.random.fold_in(
                    k, int(prng.Stream.DISTRIBUTED_DP)))(keys)
                m_real = psum_(mask.sum())
                if cfg.dist_fuse_noise:
                    # quantize per client; draw the summed noise ONCE on
                    # the aggregate (exact by Skellam closure). The noise
                    # key is round-derived and replicated — every shard
                    # adds the identical draw AFTER the psum.
                    rk = jax.vmap(
                        lambda k: jax.random.fold_in(k, 0))(dkeys)
                    ints = ddp.stochastic_round(mat, plan.gamma, rk)
                    ints = ints * mask.astype(jnp.int32)[:, None]
                    total = psum_(jnp.sum(ints, axis=0))
                    nkey = prng.stream_key(
                        prng.round_key(self._root_key, round_idx),
                        prng.Stream.DISTRIBUTED_DP)
                    total = total + ddp.aggregate_skellam_noise(
                        nkey, m_real * (plan.mu_local / 2.0),
                        mat.shape[1])
                else:
                    ints = ddp.client_integer_payloads(
                        mat, mask, dkeys, plan.gamma, plan.mu_local)
                    total = psum_(jnp.sum(ints, axis=0))
                avg = ddp.decode_average(total, plan.gamma,
                                         plan.expected_clients)
                avg_tree = stack_unflatten(avg[None], spec)
                new_global = jax.tree.map(
                    lambda g, d: (g + d[0].astype(jnp.float32))
                    .astype(g.dtype),
                    global_vars, avg_tree)
                sigma = (jnp.float32(plan.gamma)
                         * jnp.sqrt(jnp.float32(plan.mu_local) * m_real)
                         / jnp.float32(plan.expected_clients))
                metrics = dict(metrics,
                               dp_sigma=jnp.broadcast_to(sigma, (CL,)),
                               dp_sensitivity=pre_norms)
            elif dp_mode == "dp_ftrl":
                # DP-FTRL (Kairouz et al. 2021): clip each participant's
                # params-delta to C, psum the masked SUM (no division —
                # sensitivity is per-leaf), push it into the carried
                # prefix sum, and take the FTRL(M) server step against
                # the tree-noised prefix (fl_tpu.fl.dp_ftrl). Tree-node
                # noise regenerates from a round-independent key, so the
                # same nodes give the same draws whenever a later prefix
                # reuses them — and every mesh shard generates identical
                # (replicated) noise.
                from fl_tpu.fl import dp_ftrl as ftrl
                from fl_tpu.ops.flatten import stack_flatten, stack_unflatten

                deltas_p = jax.tree.map(
                    lambda c, g: (c - g[None]).astype(jnp.float32),
                    new_stacked["params"], global_vars["params"])
                clipped, pre_norms = dp.clip_client_deltas(
                    deltas_p, max_norm)
                cmat, _ = stack_flatten(clipped)
                round_sum = psum_(jnp.tensordot(
                    mask.astype(jnp.float32), cmat, axes=1))
                pmat, pspec = stack_flatten(jax.tree.map(
                    lambda g: g[None].astype(jnp.float32),
                    global_vars["params"]))
                tree_key = self._ftrl_tree_key
                (new_pflat, ftrl_cumsum_out, ftrl_noisy_out,
                 ftrl_mom_out) = ftrl.ftrl_server_step(
                    pmat[0], ftrl_cumsum, ftrl_prev_noisy, ftrl_mom,
                    round_sum, tree_key,
                    round_idx.astype(jnp.uint32) + 1,
                    self._ftrl_sigma_node, self._ftrl_height,
                    cfg.ftrl_server_lr, float(self._ftrl_cohort),
                    cfg.ftrl_momentum)
                new_params = jax.tree.map(
                    lambda s, g: s[0].astype(g.dtype),
                    stack_unflatten(new_pflat[None], pspec),
                    global_vars["params"])
                new_global = dict(global_vars)
                new_global["params"] = new_params
                metrics = dict(
                    metrics,
                    dp_sigma=jnp.broadcast_to(
                        jnp.float32(self._ftrl_sigma_node), (CL,)),
                    dp_sensitivity=pre_norms)
            else:
                # FedAvg: sample-weighted, participation-masked;
                # non-participants contribute the *global* model (delta
                # form), so a partial round moves only by the participants'
                # weighted deltas
                if feddyn:
                    # FedDyn owns the server update: θ ← mean_P(θ_i) − h/α
                    # with h ← h − (α/N)Σ_P Δ_i (Acar et al. 2021 Alg. 1).
                    # d_mat was computed above from the raw trajectories.
                    from fl_tpu.fl.feddyn import feddyn_server_update
                    from fl_tpu.ops.flatten import (
                        stack_flatten as _sf,
                        stack_unflatten as _su,
                    )

                    pmat, pspec = _sf(jax.tree.map(
                        lambda g: g[None].astype(jnp.float32),
                        global_vars["params"]))
                    new_pflat, fd_h_out, fd_grads_out = feddyn_server_update(
                        pmat[0], fd_h, fd_grads, d_mat, mask,
                        cfg.feddyn_alpha, C, psum_)
                    new_params = jax.tree.map(
                        lambda s, g: s[0].astype(g.dtype),
                        _su(new_pflat[None], pspec),
                        global_vars["params"])
                    new_global = dict(global_vars)
                    new_global["params"] = new_params
                    # (batch_stats models are refused at config time)
                agg_src = new_stacked
                if not cfg.aggregate_batch_stats and "batch_stats" in agg_src:
                    agg_src = dict(agg_src)
                    # re-broadcast the REFERENCE stats so the delta below
                    # is exactly zero (broadcasting the master's stats
                    # would leak -quantization_error into them under
                    # downlink compression)
                    agg_src["batch_stats"] = jax.tree.map(
                        lambda x: jnp.broadcast_to(
                            jnp.expand_dims(x, 0), (CL,) + x.shape
                        ),
                        ref_vars["batch_stats"],
                    )
                if feddyn:
                    pass  # new_global computed by the FedDyn server step
                elif qffl:
                    from fl_tpu.fl.qffl import qffl_combine

                    # loss-weighted, h-normalized server step; deltas
                    # measured vs θ̂ (what clients received), applied to
                    # the full-precision master
                    new_global = qffl_combine(
                        global_vars, ref_vars, agg_src, pre_losses, mask,
                        cfg.qffl_q, cfg.training.learning_rate, psum_)
                elif cfg.aggregation != "fedavg":
                    from fl_tpu.fl.robust_agg import robust_combine_deltas

                    # trimmed-mean/median sorts and Krum pairwise distances
                    # need every client's update on every device — gather
                    # the stacked trees (inherent to the algorithm), then
                    # run the existing combine replicated
                    new_global = robust_combine_deltas(
                        global_vars, gather_clients(agg_src),
                        gather_clients(mask), cfg.aggregation,
                        trim_k=cfg.trim_k, krum_f=cfg.krum_f,
                        krum_m=cfg.krum_m,
                    )
                elif cfg.secure_aggregation:
                    from fl_tpu.fl.secure_agg import secure_fedavg_delta

                    # ring-graph pairwise masks span shard boundaries;
                    # gather and run the masking+cancellation replicated
                    new_global = secure_fedavg_delta(
                        global_vars, gather_clients(agg_src),
                        gather_clients(num_samples), gather_clients(mask),
                        prng.round_key(self._root_key, round_idx),
                        neighbors=cfg.secure_agg_neighbors,
                        scale=cfg.secure_agg_scale,
                    )
                else:
                    # distributed sample-weighted FedAvg: normalize the
                    # local weight block against the psum'd global totals,
                    # then one weighted partial sum + psum per tree leaf —
                    # the round's only collective on the fast path.
                    # Matches fa.normalized_client_weights incl. the
                    # uniform fallback when all weighted counts are zero.
                    nmf = num_samples.astype(jnp.float32) * mask
                    total = psum_(nmf.sum())
                    msum = psum_(mask.sum())
                    w_local = jnp.where(
                        total > 0,
                        nmf / jnp.maximum(total, 1e-12),
                        mask / jnp.maximum(msum, 1.0))
                    w_params = w_local
                    if cfg.fednova:
                        # normalized averaging (Wang et al. 2020 eq. 6):
                        # θ⁺ = θ + τ_eff · Σ p_i (Δ_i / a_i). Reduces to
                        # FedAvg exactly when every participant shares one
                        # a (homogeneous epochs). a_i is an SGD-trajectory
                        # identity on PARAMS only — batch_stats (running
                        # EMAs, not optimizer trajectories) keep the plain
                        # sample weights, whose nova form sums to >1 and
                        # would extrapolate the running stats.
                        a_i = fa.fednova_effective_steps(
                            epochs.astype(jnp.float32) * steps_per_epoch,
                            cfg.training.momentum)
                        tau_eff = psum_((w_local * a_i).sum())
                        w_params = (tau_eff * w_local
                                    / jnp.maximum(a_i, 1e-12))

                    def _combine_with(w):
                        def _combine(c, g, ref):
                            # delta vs what clients received; applied to
                            # the full-precision master (ref == g when
                            # downlink compression is off)
                            d = (c - ref[None]).astype(jnp.float32)
                            avg = psum_(jnp.tensordot(w, d, axes=1))
                            return (g + avg).astype(g.dtype)

                        return _combine

                    new_global = {
                        key: jax.tree.map(
                            _combine_with(w_params if key == "params"
                                          else w_local),
                            agg_src[key], global_vars[key], ref_vars[key])
                        for key in agg_src
                    }

            # convergence norms (device-side; host detector consumes scalars)
            w_change = pt.global_norm(pt.tree_sub(new_global, global_vars))
            w_norm = pt.global_norm(new_global)

            if axis is None:
                w = fa.normalized_client_weights(num_samples, mask)
            else:
                nmf = num_samples.astype(jnp.float32) * mask
                tot = psum_(nmf.sum())
                w = jnp.where(tot > 0,
                              nmf / jnp.maximum(tot, 1e-12),
                              mask / jnp.maximum(psum_(mask.sum()), 1.0))
            out_metrics = {
                "train_loss": psum_(jnp.sum(metrics["loss"] * w)),
                "train_accuracy": psum_(jnp.sum(metrics["accuracy"] * w)),
                "weight_change_norm": w_change,
                "weight_norm": w_norm,
                "client_loss": metrics["loss"],
                "client_accuracy": metrics["accuracy"],
            }
            if dp_mode in ("delta", "client_dp", "dp_ftrl", "distributed"):
                out_metrics["dp_sigma_mean"] = (
                    psum_(metrics["dp_sigma"].sum()) / C)
            if adaptive:
                # already replicated: computed from psum'd centered sum
                out_metrics["next_clip_norm"] = metrics["next_clip_norm"]
                out_metrics["clip_fraction"] = metrics["clip_fraction"]
            if uplink_kind != "none":
                out_metrics["uplink_ef_norm"] = metrics["uplink_ef_norm"]
            if qffl:
                # F_k(θ̂) per client: the fairness signal q-FFL optimizes
                out_metrics["client_pre_loss"] = pre_losses
            if scaffold:
                return new_global, ef_out, (sc_c_out, sc_ci_out), out_metrics
            if feddyn:
                return (new_global, ef_out, (fd_h_out, fd_grads_out),
                        out_metrics)
            if ftrl_on:
                return (new_global, ef_out,
                        (ftrl_cumsum_out, ftrl_noisy_out, ftrl_mom_out),
                        out_metrics)
            return new_global, ef_out, out_metrics

        return superstep

    # ------------------------------------------------------------------
    # host round loop
    # ------------------------------------------------------------------
    def _steps_per_round(self) -> int:
        t = self.config.training
        steps_per_epoch = max(1, self.data.samples_per_client // t.batch_size)
        return t.local_epochs * steps_per_epoch

    def _rdp_round_params(self) -> Tuple[float, int]:
        """(sampling rate q, mechanism invocations) for one round's RDP step.

        dp_sgd: example-level — q = batch/shard, one invocation per local
        step. Padded shard slots are masked out of the DP gradient
        (local_training.py), so each real example occupies exactly one
        uniformly-random slot per epoch and its per-step inclusion
        probability is exactly this q (shuffle-based sampling accounted as
        Poisson — the standard approximation, as in opacus/tf-privacy).
        client_dp: client-level — q = participation rate, ONE invocation
        per round (the central noised aggregate)."""
        cfg = self.config
        if cfg.dp_mode == "client_dp":
            return min(1.0, cfg.participation_rate), 1
        q = cfg.training.batch_size / max(self.data.samples_per_client, 1)
        return q, self._steps_per_round()

    def _pld_step_budget(self) -> int:
        """Max mechanism invocations the PLD curve certifies under
        (privacy.epsilon, privacy.delta) at this engine's (q, z). Computed
        once (doubling + bisection on the tight hockey-stick bound at the
        configured pessimistic grid) and cached; enforcement then costs
        one integer compare per round."""
        if self._pld_max_steps is not None:
            return self._pld_max_steps
        from fl_tpu.fl.pld import compute_epsilon_pld

        q, _ = self._rdp_round_params()
        z = self.privacy.noise_multiplier
        eps, delt, dt = (self.privacy.epsilon, self.privacy.delta,
                         self.config.pld_dt)
        if compute_epsilon_pld(1, q, z, delt, dt) > eps:
            self._pld_max_steps = 0
            return 0
        lo, hi = 1, 2
        while compute_epsilon_pld(hi, q, z, delt, dt) <= eps:
            lo, hi = hi, hi * 2
            if hi > 1 << 24:
                break
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if compute_epsilon_pld(mid, q, z, delt, dt) <= eps:
                lo = mid
            else:
                hi = mid
        self._pld_max_steps = lo
        return lo

    def certified_epsilon(self, delta: Optional[float] = None,
                          dt: Optional[float] = None) -> float:
        """ε certified for everything released so far, by the configured
        accountant. Under 'pld' this composes the tight privacy-loss
        distribution of the steps actually taken (fine grid); under 'rdp'
        it is the moments-accountant value."""
        delta = self.privacy.delta if delta is None else delta
        if self.config.accountant == "pld":
            from fl_tpu.fl.pld import compute_epsilon_pld

            if dt is None:
                # default to the gate/calibration grid: the auto grid is
                # sized from the LOOSER RDP estimate and can be coarser
                # than the grid the noise was calibrated on, over-
                # reporting ε by pure discretization slack
                dt = self.config.pld_dt
            q, _ = self._rdp_round_params()
            return compute_epsilon_pld(
                self._pld_steps_taken, q,
                self.privacy.noise_multiplier, delta, dt)
        if self.rdp_accountant is not None:
            return self.rdp_accountant.get_epsilon(delta)
        return self.accountant.get_total_privacy_cost()[0]

    def sample_participation(
        self, exclude: Optional[List[int]] = None
    ) -> np.ndarray:
        """Build the per-round participation mask: Bernoulli participation ×
        straggler dropout × failure-handler exclusions, with min_clients
        enforced and max_clients capped (by sample count, matching the
        reference's cap rule, fedavg.py:82-86).

        client_dp mode: the mask is PURE Poisson sampling at
        ``participation_rate`` (minus exclusions/dropout, which only lower a
        client's inclusion probability and are privacy-safe). min_clients
        forcing and max_clients capping are data-dependent selections with
        inclusion probability ≈1 that would void the subsampling
        amplification the RDP accountant relies on, so both are disabled in
        this mode — the fixed-denominator mean keeps under-full rounds
        well-defined (they simply move the model less).
        """
        cfg = self.config
        if cfg.dp_mode == "dp_ftrl":
            # deterministic round-robin cohorts — DP-FTRL needs NO
            # sampling randomness (its guarantee holds for arbitrary
            # orderings); rotation also maximizes rounds within the
            # per-client participation budget k
            from fl_tpu.fl.dp_ftrl import rotation_mask

            mask = rotation_mask(self.num_clients, self.round_number,
                                 self._ftrl_cohort)
            if cfg.straggler_dropout_rate > 0:
                # dropping clients only SHRINKS participation — always
                # privacy-safe under DP-FTRL's arbitrary-ordering guarantee
                mask *= (self._np_rng.random(self.num_clients)
                         >= cfg.straggler_dropout_rate).astype(np.float32)
            if exclude:
                mask[np.asarray(exclude, int)] = 0.0
            return mask
        mask = (
            self._np_rng.random(self.num_clients) < cfg.participation_rate
        ).astype(np.float32)
        if cfg.straggler_dropout_rate > 0:
            mask *= (
                self._np_rng.random(self.num_clients) >= cfg.straggler_dropout_rate
            ).astype(np.float32)
        if exclude:
            mask[np.asarray(exclude, int)] = 0.0
        if cfg.dp_mode == "client_dp":
            return mask  # Poisson only — see docstring
        active_count = int(mask.sum())
        if active_count < cfg.min_clients:
            # force-include the largest shards until min_clients is met
            excluded = set(int(e) for e in exclude) if exclude else ()
            order = np.argsort(-np.asarray(self.data.num_samples))
            for c in order:
                if active_count >= cfg.min_clients:
                    break
                if int(c) not in excluded and mask[c] == 0.0:
                    mask[c] = 1.0
                    active_count += 1
        if mask.sum() > cfg.max_clients:
            active = np.flatnonzero(mask)
            counts = np.asarray(self.data.num_samples)[active]
            keep = active[np.argsort(-counts)[: cfg.max_clients]]
            mask[:] = 0.0
            mask[keep] = 1.0
        return mask

    def run_round(
        self,
        mask: Optional[np.ndarray] = None,
        evaluate: bool = True,
        inject_flags: Optional[np.ndarray] = None,
        inject_deltas=None,
    ) -> RoundResult:
        """Execute one FedAvg round (superstep + host bookkeeping)."""
        return self._finalize_round(
            self._dispatch_round(mask, inject_flags, inject_deltas),
            evaluate=evaluate,
        )

    def run_rounds_pipelined(
        self,
        num_rounds: int,
        evaluate: bool = False,
        masks: Optional[np.ndarray] = None,
    ) -> List[RoundResult]:
        """``num_rounds`` sequential rounds with depth-1 dispatch
        pipelining: round r+1's superstep is enqueued before round r's
        metrics are read back, so the host control plane (dispatch
        latency, the metrics readback RTT, privacy accounting,
        convergence bookkeeping) overlaps device compute instead of
        serializing with it. On a remote-attached TPU this hides the
        transport round trips that dominate the wall-vs-device gap
        (docs/performance.md round-5 table).

        Semantics match a run_round loop exactly — every budget check and
        charge still happens at its round's dispatch, before the next
        round is enqueued — EXCEPT that host state feeding the next
        dispatch cannot come from the previous round's metrics, so
        adaptive_clipping refuses this path (its clip norm is a
        metrics-derived host carry). External host policies that read
        ``last_client_losses`` / ``last_client_accuracies`` between
        rounds (e.g. Oort-style selection, fl_tpu.orchestration.selection)
        see signals one round stale under pipelining — drive those loops
        with run_round, or pass precomputed ``masks``."""
        if self.config.adaptive_clipping:
            raise ValueError(
                "run_rounds_pipelined cannot pipeline adaptive_clipping "
                "(round r+1's clip norm comes from round r's metrics); "
                "use run_round / run")
        results: List[RoundResult] = []
        pending: Optional[_PendingRound] = None
        try:
            for r in range(num_rounds):
                nxt = self._dispatch_round(
                    None if masks is None else masks[r])
                if pending is not None:
                    results.append(
                        self._finalize_round(pending, evaluate=evaluate))
                pending = nxt
        except Exception:
            # a refused dispatch (budget exhaustion, roster checks) must
            # not orphan the already-dispatched round: finalize it so
            # history/ledger stay coherent, then surface the refusal
            if pending is not None:
                results.append(
                    self._finalize_round(pending, evaluate=evaluate))
            raise
        results.append(self._finalize_round(pending, evaluate=evaluate))
        return results

    def _dispatch_round(
        self,
        mask: Optional[np.ndarray] = None,
        inject_flags: Optional[np.ndarray] = None,
        inject_deltas=None,
    ) -> _PendingRound:
        """Pre-round checks + budget charging + superstep dispatch.

        Returns device handles; does NOT block on device compute. All
        HOST round state is updated here (accountants charged, round
        number advanced) so a subsequent dispatch sees this round's
        charges even before its metrics are read back; only the ledger
        entry (whose metadata wants measured noise scales) and the
        metrics-derived bookkeeping wait for _finalize_round."""
        cfg = self.config
        t0 = time.perf_counter()
        if mask is None:
            mask = self.sample_participation()
        # robust aggregators need enough REALIZED participants (config-time
        # checks only cover the expected count)
        if cfg.aggregation == "trimmed_mean":
            m = int(np.sum(np.asarray(mask) > 0))
            if m - 2 * cfg.trim_k < 1:
                raise ValueError(
                    f"trimmed_mean(trim_k={cfg.trim_k}) needs more than "
                    f"{2 * cfg.trim_k} participants; this round realized {m}")
        elif cfg.aggregation == "krum":
            m = int(np.sum(np.asarray(mask) > 0))
            if m < 2 * cfg.krum_f + 3:
                # Blanchard et al. 2017: the (f, n)-Byzantine-resilience
                # guarantee needs n ≥ 2f+3 — at f+3..2f+2, f colluders
                # submitting identical updates can score 0 and be selected
                raise ValueError(
                    f"krum(f={cfg.krum_f}) needs at least 2f+3="
                    f"{2 * cfg.krum_f + 3} participants; this round "
                    f"realized {m}")
        dist_rdp = None
        if cfg.dp_mode == "dp_ftrl":
            if self.round_number >= cfg.ftrl_rounds:
                raise dp.PrivacyError(
                    f"dp_ftrl tree exhausted: ftrl_rounds={cfg.ftrl_rounds} "
                    "fixed the tree height and sensitivity; running more "
                    "rounds would exceed the certified ε. Start a new "
                    "engine to continue (tree restart) — and let it draw "
                    "a FRESH ftrl_tree_nonce (the default): reusing a "
                    "nonce across trees reuses node noise, which "
                    "differencing would cancel.")
            would = self.ftrl_participations + (np.asarray(mask) > 0)
            if int(would.max()) > cfg.ftrl_max_participations:
                over = np.flatnonzero(
                    would > cfg.ftrl_max_participations)[:8]
                raise dp.PrivacyError(
                    "dp_ftrl participation budget exceeded: clients "
                    f"{over.tolist()} would pass max_participations="
                    f"{cfg.ftrl_max_participations}, which the certified "
                    "sensitivity C*sqrt(k*h) assumed. Use rotation masks "
                    "(fl_tpu.fl.dp_ftrl.rotation_mask) or raise k (and "
                    "re-derive the noise).")
        if (cfg.dp_mode in ("dp_sgd", "client_dp")
                and self.rdp_accountant is not None):
            q, steps = self._rdp_round_params()
            if cfg.accountant == "pld":
                # the step budget is precomputed from the tight PLD curve
                # (pessimistic coarse grid — never over-certifies); refuse
                # to overdraw it
                if (self._pld_steps_taken + steps
                        > self._pld_step_budget()):
                    raise dp.PrivacyError(
                        f"Privacy budget exhausted — the next {cfg.dp_mode} "
                        f"round would exceed ε={self.privacy.epsilon} "
                        "(PLD accounting: "
                        f"{self._pld_steps_taken}+{steps} steps > "
                        f"{self._pld_step_budget()} certified)"
                    )
            else:
                # project the RDP ε after this round; refuse to overdraw
                import copy

                projected = copy.deepcopy(self.rdp_accountant)
                projected.step(q, self.privacy.noise_multiplier, steps)
                if (projected.get_epsilon(self.privacy.delta)
                        > self.privacy.epsilon):
                    raise dp.PrivacyError(
                        f"Privacy budget exhausted — the next {cfg.dp_mode} "
                        f"round would exceed ε={self.privacy.epsilon} "
                        "(RDP accounting)"
                    )
        elif cfg.dp_mode == "distributed":
            # Skellam RDP at the REALIZED participant count (mask is
            # fixed by now): fewer participants → less summed noise →
            # a bigger per-round charge; refuse to overdraw
            import copy

            dist_rdp = self._dist_plan.round_rdp(
                int(np.sum(np.asarray(mask) > 0)))
            projected = copy.deepcopy(self.rdp_accountant)
            projected.accumulate(dist_rdp)
            if projected.get_epsilon(self.privacy.delta) > self.privacy.epsilon:
                raise dp.PrivacyError(
                    "Privacy budget exhausted — the next distributed-DP "
                    f"round would exceed ε={self.privacy.epsilon} "
                    "(Skellam RDP accounting)"
                )
        elif (self.budget_tracker is not None
              and cfg.dp_mode not in ("none", "dp_ftrl")):
            eps_r = cfg.epsilon_per_round or self.privacy.epsilon
            del_r = cfg.delta_per_round or self.privacy.delta
            if self.budget_tracker.is_budget_exhausted(eps_r, del_r):
                raise dp.PrivacyError(
                    "Privacy budget exhausted — cannot run another DP round"
                )

        step_args = (
            self.global_variables,
            jnp.asarray(self.round_number, jnp.int32),
            jnp.asarray(mask, jnp.float32),
            jnp.asarray(self.epochs_per_client),
            self.data.images,
            self.data.labels,
            self.data.num_samples,
            self.uplink_error,
        )
        if cfg.adaptive_clipping:
            step_args = step_args + (
                jnp.asarray(self.clip_norm, jnp.float32),)
        if cfg.audit_injection:
            if inject_flags is None:
                if self._zero_injection is None:
                    self._zero_injection = (
                        jnp.zeros((self.num_clients,), jnp.float32),
                        jax.tree.map(
                            lambda x: jnp.zeros(
                                (self.num_clients,) + x.shape, x.dtype),
                            self.global_variables))
                step_args = step_args + self._zero_injection
            else:
                step_args = step_args + (
                    jnp.asarray(inject_flags, jnp.float32), inject_deltas)
        elif inject_flags is not None:
            raise ValueError(
                "inject_flags passed but config.audit_injection is off")
        if cfg.scaffold:
            step_args = step_args + (self.scaffold_c, self.scaffold_ci)
            (new_global, self.uplink_error,
             (self.scaffold_c, self.scaffold_ci),
             metrics) = self._superstep(*step_args)
        elif cfg.feddyn_alpha > 0:
            step_args = step_args + (self.feddyn_h, self.feddyn_grads)
            (new_global, self.uplink_error,
             (self.feddyn_h, self.feddyn_grads),
             metrics) = self._superstep(*step_args)
        elif cfg.dp_mode == "dp_ftrl":
            step_args = step_args + (self.ftrl_cumsum, self.ftrl_prev_noisy,
                                     self.ftrl_momentum_buf)
            (new_global, self.uplink_error,
             (self.ftrl_cumsum, self.ftrl_prev_noisy,
              self.ftrl_momentum_buf),
             metrics) = self._superstep(*step_args)
            self.ftrl_participations += (np.asarray(mask) > 0)
        else:
            new_global, self.uplink_error, metrics = \
                self._superstep(*step_args)
        if self._server_update is not None:
            # adaptive server step on the pseudo-gradient x_t - fedavg(x)
            # (params only; batch_stats keep the FedAvg result)
            old_params = self.global_variables["params"]
            if self.server_opt_state is None:
                self.server_opt_state = self._server_opt.init(old_params)
            new_params, self.server_opt_state = self._server_update(
                old_params, new_global["params"], self.server_opt_state
            )
            new_global = dict(new_global)
            new_global["params"] = new_params
        self.global_variables = new_global
        round_clip = None
        if cfg.adaptive_clipping:
            round_clip = self.clip_norm  # the C this round actually used

        # ---- budget charging (host state only — metrics not needed) ----
        # The LEDGER entry for the charge is deferred to _finalize_round
        # via a closure: its metadata records measured noise scales that
        # live in the (still in-flight) device metrics.
        eps_spent = 0.0
        ledger: Optional[Callable[[Dict[str, Any]], None]] = None
        rn = self.round_number
        if (cfg.dp_mode in ("dp_sgd", "client_dp")
                and self.rdp_accountant is not None):
            q, steps = self._rdp_round_params()
            self._pld_steps_taken += steps
            before = self.rdp_accountant.get_epsilon(self.privacy.delta) \
                if rn > 0 else 0.0
            self.rdp_accountant.step(q, self.privacy.noise_multiplier, steps)
            total_eps = self.rdp_accountant.get_epsilon(self.privacy.delta)
            eps_spent = total_eps - before

            def ledger(m, _eps=eps_spent, _tot=total_eps, _q=q,
                       _steps=steps, _clip=round_clip):
                self.accountant.add_mechanism(
                    "subsampled_gaussian", _eps, 0.0,
                    sensitivity=(_clip if _clip is not None
                                 else self.privacy.max_grad_norm),
                    noise_scale=float(m.get("dp_sigma_mean", 0.0))
                    if cfg.dp_mode == "client_dp"
                    else (self.privacy.noise_multiplier
                          * self.privacy.max_grad_norm
                          / cfg.training.batch_size),
                    metadata={"round": rn, "mode": cfg.dp_mode,
                              "total_epsilon": _tot, "q": _q,
                              "steps": _steps},
                )
        elif cfg.dp_mode == "distributed":
            before = self.rdp_accountant.get_epsilon(self.privacy.delta) \
                if rn > 0 else 0.0
            self.rdp_accountant.accumulate(dist_rdp)
            total_eps = self.rdp_accountant.get_epsilon(self.privacy.delta)
            eps_spent = total_eps - before
            plan = self._dist_plan
            m_real = int(np.sum(np.asarray(mask) > 0))

            def ledger(m, _eps=eps_spent, _tot=total_eps, _m=m_real):
                plan = self._dist_plan
                self.accountant.add_mechanism(
                    "skellam_distributed", _eps, 0.0,
                    sensitivity=plan.clip_norm,
                    noise_scale=plan.central_sigma_float(_m),
                    metadata={"round": rn, "mode": cfg.dp_mode,
                              "total_epsilon": _tot,
                              "realized_clients": _m,
                              "bits": plan.bits,
                              "mu_central": plan.mu_local * max(_m, 0)},
                )
        elif cfg.dp_mode == "dp_ftrl":
            # the WHOLE tree is one Gaussian mechanism certified up
            # front; charge the ledger once, at round 0 — later rounds
            # release through the same already-paid-for tree
            if rn == 0:
                eps_spent = self._ftrl_eps_total
                if self.budget_tracker is not None:
                    self.budget_tracker.consume_budget(
                        eps_spent, self.privacy.delta, "dp_ftrl_tree")
                from fl_tpu.fl import dp_ftrl as ftrl

                self.accountant.add_mechanism(
                    "tree_gaussian", eps_spent, self.privacy.delta,
                    sensitivity=ftrl.ftrl_sensitivity(
                        self.privacy.max_grad_norm, cfg.ftrl_rounds,
                        cfg.ftrl_max_participations),
                    noise_scale=self._ftrl_sigma_node,
                    metadata={"mode": "dp_ftrl",
                              "t_max": cfg.ftrl_rounds,
                              "k": cfg.ftrl_max_participations,
                              "height": self._ftrl_height,
                              "z": self.privacy.noise_multiplier},
                )
        elif self.budget_tracker is not None and cfg.dp_mode != "none":
            eps_r = cfg.epsilon_per_round or self.privacy.epsilon
            del_r = cfg.delta_per_round or self.privacy.delta
            self.budget_tracker.consume_budget(eps_r, del_r,
                                               f"round_{rn}")
            eps_spent = eps_r

            def ledger(m, _eps=eps_r, _del=del_r):
                sigma = float(m.get("dp_sigma_mean", 0.0)) \
                    if cfg.dp_mode == "delta" else 0.0
                self.accountant.add_mechanism(
                    "gaussian", _eps, _del,
                    sensitivity=self.privacy.max_grad_norm,
                    noise_scale=sigma,
                    metadata={"round": rn, "mode": cfg.dp_mode},
                )

        pending = _PendingRound(
            round_number=rn, mask=np.asarray(mask), t0=t0,
            metrics=metrics, variables=new_global, eps_spent=eps_spent,
            round_clip=round_clip, ledger=ledger,
        )
        self.round_number += 1
        return pending

    def _finalize_round(
        self, pending: _PendingRound, evaluate: bool = True
    ) -> RoundResult:
        """Blocking half of a round: read back the metrics tree in ONE
        host transfer (each separate ``float(metrics[k])`` /
        ``np.asarray`` on a device array is its own blocking round trip
        through the PJRT transport — ~8 RTTs/round on a remote-attached
        TPU), then do the metrics-dependent bookkeeping."""
        cfg = self.config
        metrics = jax.device_get(pending.metrics)
        if cfg.adaptive_clipping:
            self.clip_norm = float(metrics["next_clip_norm"])
        if pending.ledger is not None:
            pending.ledger(metrics)

        test_loss = test_acc = None
        if evaluate and self._eval_fn is not None:
            ev = jax.device_get(self._eval_fn(
                pending.variables, self.test_images, self.test_labels))
            test_loss = float(ev["loss"])
            test_acc = float(ev["accuracy"])

        obs = RoundObservation(
            round_number=pending.round_number,
            accuracy=test_acc if test_acc is not None
            else float(metrics["train_accuracy"]),
            loss=test_loss if test_loss is not None
            else float(metrics["train_loss"]),
            weight_change_norm=float(metrics["weight_change_norm"]),
            weight_norm=float(metrics["weight_norm"]),
        )
        conv = self.detector.update(obs)

        result = RoundResult(
            round_number=pending.round_number,
            train_loss=float(metrics["train_loss"]),
            train_accuracy=float(metrics["train_accuracy"]),
            test_loss=test_loss,
            test_accuracy=test_acc,
            convergence_score=conv.convergence_score,
            participating_clients=int(pending.mask.sum()),
            round_time_s=time.perf_counter() - pending.t0,
            epsilon_spent=pending.eps_spent,
            clip_norm=pending.round_clip,
        )
        # per-client training signals for host-side policies (client
        # selection, failure scoring). Only participants' entries are
        # meaningful — non-participants trained on masked no-ops.
        self.last_client_losses = np.asarray(metrics["client_loss"])
        self.last_client_accuracies = np.asarray(
            metrics["client_accuracy"])
        if "client_pre_loss" in metrics:
            # q-FFL: F_k(θ̂) at the round's received model — the fairness
            # signal the reweighting acts on (valid for ALL clients, not
            # just participants: it is computed before local training)
            self.last_client_pre_losses = np.asarray(
                metrics["client_pre_loss"])
        self.history.append(result)
        return result

    def run(
        self,
        num_rounds: int,
        target_accuracy: Optional[float] = None,
        early_stopping: bool = False,
        evaluate_every: int = 1,
        verbose: bool = False,
    ) -> List[RoundResult]:
        """Drive ``num_rounds`` rounds with the reference's exit criteria
        (target accuracy / round budget / early stop — ref:
        federated_simulation.py:362-428)."""
        for r in range(num_rounds):
            evaluate = (r % evaluate_every == 0) or (r == num_rounds - 1)
            result = self.run_round(evaluate=evaluate)
            if verbose:
                logger.info(
                    "round %d: train_acc=%.4f test_acc=%s loss=%.4f (%.3fs)",
                    result.round_number, result.train_accuracy,
                    f"{result.test_accuracy:.4f}" if result.test_accuracy
                    is not None else "-",
                    result.train_loss, result.round_time_s,
                )
            if (target_accuracy is not None and result.test_accuracy is not None
                    and result.test_accuracy >= target_accuracy):
                logger.info("Target accuracy %.3f reached at round %d",
                            target_accuracy, result.round_number)
                break
            if early_stopping:
                stop, reason = self.detector.should_stop_early()
                if stop:
                    logger.info("Early stopping: %s", reason)
                    break
        return self.history

    # ------------------------------------------------------------------
    # fused multi-round execution
    # ------------------------------------------------------------------
    def run_rounds_fused(
        self,
        num_rounds: int,
        masks: Optional[np.ndarray] = None,
        evaluate: bool = True,
        evaluate_every: Optional[int] = None,
    ) -> List[RoundResult]:
        """Run ``num_rounds`` FedAvg rounds as ONE compiled ``lax.scan`` —
        zero host round trips between rounds.

        The per-round host control plane (participation sampling, budget
        checks) moves up front: masks are sampled for all rounds first and
        shipped as an (R, C) array; DP budget for all R rounds is checked
        and consumed in one transaction. Convergence detection consumes the
        returned per-round series afterwards. This amortizes dispatch
        latency (significant on remote-attached TPUs) and is the natural
        shape for throughput benchmarking (BASELINE config #5).
        """
        cfg = self.config
        if cfg.scaffold:
            raise ValueError(
                "run_rounds_fused does not support scaffold (the control-"
                "variate state is carried on the host between rounds); "
                "use run_round / run")
        if cfg.feddyn_alpha > 0:
            raise ValueError(
                "run_rounds_fused does not support feddyn (the g_i/h "
                "state is carried on the host between rounds); use "
                "run_round / run")
        if cfg.dp_mode == "dp_ftrl":
            raise ValueError(
                "run_rounds_fused does not support dp_ftrl (mechanism "
                "state and the participation ledger are carried on the "
                "host between rounds); use run_round / run")
        if self._server_opt is not None:
            raise ValueError(
                "run_rounds_fused does not support a server optimizer "
                "(its state lives on the host between rounds); use "
                "run_round / run"
            )
        if cfg.adaptive_clipping:
            raise ValueError(
                "run_rounds_fused does not support adaptive_clipping (the "
                "clip norm is host-carried round state); use run_round / run"
            )
        if cfg.audit_injection:
            raise ValueError(
                "run_rounds_fused does not support audit_injection (canary "
                "deltas are per-round host inputs); use run_round / run"
            )
        if masks is None:
            masks = np.stack([self.sample_participation()
                              for _ in range(num_rounds)])
        masks = np.asarray(masks, np.float32)
        assert masks.shape == (num_rounds, self.num_clients)

        if evaluate_every is not None and evaluate_every < 1:
            raise ValueError(f"evaluate_every must be >= 1, got {evaluate_every}")
        if evaluate_every is not None and evaluate_every < num_rounds:
            # chunked: one fused scan per chunk, test-set eval between
            # chunks (the fully-fused scan can only evaluate at the end)
            results: List[RoundResult] = []
            for start in range(0, num_rounds, evaluate_every):
                chunk = masks[start:start + evaluate_every]
                results.extend(self.run_rounds_fused(
                    len(chunk), masks=chunk, evaluate=evaluate))
            return results

        # budget: all R rounds up front
        eps_r = del_r = 0.0
        dist_rdp_rounds = None
        if (cfg.dp_mode in ("dp_sgd", "client_dp")
                and self.rdp_accountant is not None):
            import copy

            q, steps = self._rdp_round_params()
            projected = copy.deepcopy(self.rdp_accountant)
            projected.step(q, self.privacy.noise_multiplier,
                           steps * num_rounds)
            if projected.get_epsilon(self.privacy.delta) > self.privacy.epsilon:
                raise dp.PrivacyError(
                    f"{num_rounds} {cfg.dp_mode} rounds would exceed "
                    f"ε={self.privacy.epsilon} (RDP accounting)"
                )
        elif cfg.dp_mode == "distributed":
            # Skellam RDP per round at each round's realized participant
            # count (all masks are sampled up front in this path)
            import copy

            dist_rdp_rounds = [
                self._dist_plan.round_rdp(int(np.sum(masks[i] > 0)))
                for i in range(num_rounds)]
            projected = copy.deepcopy(self.rdp_accountant)
            for vec in dist_rdp_rounds:
                projected.accumulate(vec)
            if projected.get_epsilon(self.privacy.delta) > self.privacy.epsilon:
                raise dp.PrivacyError(
                    f"{num_rounds} distributed-DP rounds would exceed "
                    f"ε={self.privacy.epsilon} (Skellam RDP accounting)"
                )
        elif self.budget_tracker is not None and cfg.dp_mode != "none":
            eps_r = cfg.epsilon_per_round or self.privacy.epsilon
            del_r = cfg.delta_per_round or self.privacy.delta
            if self.budget_tracker.is_budget_exhausted(eps_r * num_rounds,
                                                       del_r * num_rounds):
                raise dp.PrivacyError(
                    f"{num_rounds} DP rounds would exhaust the privacy budget"
                )

        if getattr(self, "_fused_rounds_fn", None) is None:
            superstep = self._build_superstep()

            def fused(global_vars, start_round, masks_arr, epochs,
                      images, labels, num_samples, ef_state):
                def body(carry, rm):
                    gv, ef = carry
                    round_idx, mask = rm
                    new_gv, new_ef, metrics = superstep(
                        gv, round_idx, mask, epochs, images, labels,
                        num_samples, ef,
                    )
                    keep = {k: metrics[k] for k in
                            ("train_loss", "train_accuracy",
                             "weight_change_norm", "weight_norm")}
                    return (new_gv, new_ef), keep

                rounds = start_round + jnp.arange(masks_arr.shape[0],
                                                  dtype=jnp.int32)
                return jax.lax.scan(body, (global_vars, ef_state),
                                    (rounds, masks_arr))

            self._fused_rounds_fn = jax.jit(fused)

        t0 = time.perf_counter()
        (new_global, new_ef), series = self._fused_rounds_fn(
            self.global_variables,
            jnp.asarray(self.round_number, jnp.int32),
            jnp.asarray(masks),
            jnp.asarray(self.epochs_per_client),
            self.data.images, self.data.labels, self.data.num_samples,
            self.uplink_error,
        )
        series = {k: np.asarray(v) for k, v in series.items()}  # host sync
        total_t = time.perf_counter() - t0
        self.global_variables = new_global
        self.uplink_error = new_ef

        # host bookkeeping per round (metrics already on host). In RDP
        # modes each round's epsilon_spent is the *marginal* RDP->(ε,δ)
        # increment at that composition depth (matching run_round), not the
        # additive per-round eps_r of delta mode.
        rdp_mode = (cfg.dp_mode in ("dp_sgd", "client_dp")
                    and self.rdp_accountant is not None)
        per_round_eps = [eps_r] * num_rounds
        if rdp_mode or dist_rdp_rounds is not None:
            prev_eps = (self.rdp_accountant.get_epsilon(self.privacy.delta)
                        if self.round_number > 0 else 0.0)
            per_round_eps = []
            if rdp_mode:
                q, steps = self._rdp_round_params()
            for i in range(num_rounds):
                if rdp_mode:
                    self.rdp_accountant.step(
                        q, self.privacy.noise_multiplier, steps)
                else:
                    self.rdp_accountant.accumulate(dist_rdp_rounds[i])
                cur = self.rdp_accountant.get_epsilon(self.privacy.delta)
                per_round_eps.append(cur - prev_eps)
                prev_eps = cur
        results: List[RoundResult] = []
        for i in range(num_rounds):
            if self.budget_tracker is not None and cfg.dp_mode == "delta":
                self.budget_tracker.consume_budget(
                    eps_r, del_r, f"round_{self.round_number}")
            obs = RoundObservation(
                round_number=self.round_number,
                accuracy=float(series["train_accuracy"][i]),
                loss=float(series["train_loss"][i]),
                weight_change_norm=float(series["weight_change_norm"][i]),
                weight_norm=float(series["weight_norm"][i]),
            )
            conv = self.detector.update(obs)
            results.append(RoundResult(
                round_number=self.round_number,
                train_loss=float(series["train_loss"][i]),
                train_accuracy=float(series["train_accuracy"][i]),
                test_loss=None, test_accuracy=None,
                convergence_score=conv.convergence_score,
                participating_clients=int(masks[i].sum()),
                round_time_s=total_t / num_rounds,
                epsilon_spent=per_round_eps[i],
            ))
            self.round_number += 1
        if evaluate and self._eval_fn is not None:
            ev = self._eval_fn(self.global_variables, self.test_images,
                               self.test_labels)
            results[-1].test_loss = float(ev["loss"])
            results[-1].test_accuracy = float(ev["accuracy"])
        self.history.extend(results)
        return results

    # ------------------------------------------------------------------
    def profile_round(self, trace_dir: str,
                      mask: Optional[np.ndarray] = None) -> RoundResult:
        """Run one round under ``jax.profiler.trace`` (SURVEY.md §5.1: the
        reference has no tracer; here per-round XLA traces are one call
        away — view with TensorBoard or Perfetto)."""
        with jax.profiler.trace(trace_dir):
            result = self.run_round(mask=mask, evaluate=False)
        logger.info("profiler trace for round %d written to %s",
                    result.round_number, trace_dir)
        return result

    # ------------------------------------------------------------------
    def evaluate(self) -> Dict[str, float]:
        if self._eval_fn is None:
            raise ValueError("No test set configured")
        ev = self._eval_fn(self.global_variables, self.test_images,
                           self.test_labels)
        return {k: np.asarray(v).tolist() if np.ndim(v) else float(v)
                for k, v in ev.items()}

    def evaluate_federated(self) -> Dict[str, Any]:
        """Score the current global model on every client's own shard —
        per-client loss/accuracy + sample-weighted aggregate + fairness
        spread, one vmapped program (see fl_tpu.fl.federated_eval)."""
        from fl_tpu.fl.federated_eval import evaluate_federated

        return evaluate_federated(self)

    def evaluate_personalized(
        self, finetune_epochs: int = 1, finetune_fraction: float = 0.8,
    ) -> Dict[str, Any]:
        """Per-client fine-tune gain on held-out shard tails — one vmapped
        program over all clients (see fl_tpu.fl.personalization)."""
        from fl_tpu.fl.personalization import evaluate_personalization

        return evaluate_personalization(
            self, finetune_epochs=finetune_epochs,
            finetune_fraction=finetune_fraction)

    def get_model_weights(self) -> Dict[str, jax.Array]:
        return self.model.get_model_weights(self.global_variables)

    def set_model_weights(self, weights: Dict[str, Any]) -> None:
        self.global_variables = self.model.set_model_weights(
            self.global_variables, weights
        )
