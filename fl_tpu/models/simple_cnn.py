"""SimpleCNN — the MNIST flagship model.

Architecture parity with the reference (src/shared/models_pytorch.py:59-97):
conv3x3(1→32) → relu → maxpool2 → conv3x3(32→64) → relu → maxpool2 →
flatten(7·7·64) → dense(128) → relu → dropout(0.25) → dense(num_classes).

TPU notes: NHWC layout; convs and the 3136×128 dense land on the MXU. The
whole fwd/bwd is ~25 MFLOP/sample, so the win at scale comes from batching
thousands of (client × sample) images into one program, not from per-op
tuning.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class _ConvParams(nn.Module):
    """Parameter-only stand-in for an nn.Conv layer: declares the same
    kernel/bias tree (same names, shapes, initializers) so a fused op can
    consume the weights while checkpoints/FedAvg/serialization see an
    identical parameter pytree."""

    shape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b


class SimpleCNN(nn.Module):
    """``fast_ops=True`` swaps the stem conv and the pools for the
    GEMM-shaped formulations in fl_tpu.ops.fast_layers (same parameter
    tree and forward values; maxpool gradient splits ties instead of
    scattering to one argmax). Measured NET-NEGATIVE on the 512-client
    bench (docs/performance.md, round-2 campaign table) — XLA's global
    layout assignment wins — so it stays off by default; kept as a tested
    formulation alternative.

    DP instrumentation (ghost-norm clipping, fl_tpu.fl.privacy
    ``make_ghost_dp_sgd_grad_fn``): ``dp_capture=True`` additionally
    returns each parameterized layer's *input* activation, and
    ``dp_perturb`` (a dict of zero arrays shaped like each layer's
    pre-activation output) is added at those points so one batched
    backward w.r.t. the perturbations yields every example's layer-output
    gradients. Neither knob changes the parameter tree or forward values.
    ``DP_LAYERS`` declares the instrumented layer geometry
    (name -> kind) consumed by the ghost-norm engine.
    """

    num_classes: int = 10
    dropout_rate: float = 0.25
    dtype: jnp.dtype = jnp.float32
    fast_ops: bool = False
    # scatter-free max-pool BACKWARD (bit-exact; fl_tpu.ops.pool_vjp).
    # MEASURED NET-NEGATIVE on the 512-client TPU bench (1.04 vs 1.19
    # rounds/s): the int32 argmax + one-hot tensors at conv-activation
    # scale cost more HBM traffic than select-and-scatter saves — see
    # docs/performance.md round-3 table. Kept as a tested formulation.
    fast_pool_bwd: bool = False
    # tap-GEMM conv2 backward (fl_tpu.ops.conv_vjp) — targets the
    # grouped-conv dgrad/wgrad kernels (49+32.5 ms/round, ~30-60x off
    # roofline in the round-3 profile); forward unchanged
    fast_conv2_bwd: bool = False
    # tap-GEMM stem weight gradient (fl_tpu.ops.stem_vjp): kills the
    # 100 ms/round layout copy XLA inserted to feed conv1's grouped-conv
    # wgrad. MEASURED +15% on the 512-client TPU bench (1.36 vs 1.18
    # rounds/s, round 3) — the first formulation to beat XLA's lowering
    # in-program. Same forward program; wgrad matches autodiff to float
    # accumulation order (f32 accumulation via preferred_element_type).
    fast_stem_wgrad: bool = True
    # round-4: the ENTIRE conv segment (conv1→relu→pool→conv2→relu→pool,
    # fwd AND bwd) as two fused Pallas kernels with automatic 2-client
    # channel packing under the engine's client vmap
    # (fl_tpu.ops.conv_block). MEASURED +15% on the segment vs XLA at
    # bench shapes (44.6 vs 52.5 ms fwd+bwd, docs/performance.md round-4
    # table) — the first formulation to beat XLA on the conv backward.
    # Same parameter tree; pool tie-breaking bit-identical. Takes
    # precedence over the other conv formulation flags. Incompatible with
    # the ghost-DP activation taps (dp_capture/dp_perturb).
    # Round-5: the value "residual" selects conv_stack_res — same
    # f32-accumulated math with the taps packed into GEMM K (±1 bf16 ulp
    # vs conv_stack); the forward stores the compact pool2 routing index
    # so the backward skips the conv2 recompute and the full-plane
    # tie-break algebra (docs/performance.md round-5 kernel table).
    fused_conv_block: Any = False

    DP_LAYERS = (("conv1", "conv3x3"), ("conv2", "conv3x3"),
                 ("fc1", "dense"), ("fc2", "dense"))

    @nn.compact
    def __call__(self, x, *, train: bool = False, dp_perturb=None,
                 dp_capture: bool = False):
        if self.fused_conv_block and (dp_capture or dp_perturb is not None):
            raise ValueError(
                "fused_conv_block replaces the conv segment with one "
                "opaque Pallas program and cannot expose the ghost-DP "
                "activation taps (dp_capture/dp_perturb); build the model "
                "with fused_conv_block=False for dp_sgd ghost mode")
        if self.fused_conv_block:
            from fl_tpu.ops.conv_block import conv_stack, conv_stack_res

            op = (conv_stack_res if self.fused_conv_block == "residual"
                  else conv_stack)
            w1, b1 = _ConvParams((3, 3, 1, 32), name="conv1")()
            w2, b2 = _ConvParams((3, 3, 32, 64), name="conv2")()
            x = x.astype(self.dtype)
            x = op(x, w1.astype(self.dtype), b1.astype(self.dtype),
                   w2.astype(self.dtype), b2.astype(self.dtype))
            x = x.reshape((x.shape[0], -1))  # (B, 7*7*64)
            x = nn.Dense(128, dtype=self.dtype, name="fc1")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate,
                           deterministic=not train)(x)
            x = nn.Dense(self.num_classes, dtype=self.dtype,
                         name="fc2")(x)
            return x.astype(jnp.float32)
        if self.fast_ops:
            from fl_tpu.ops.fast_layers import FastConv3x3, max_pool_2x2

            conv1 = FastConv3x3(32, dtype=self.dtype, name="conv1")
            pool = max_pool_2x2
        else:
            if self.fast_stem_wgrad:
                # standard forward, tap-GEMM weight gradient that consumes
                # the output-gradient in its producer layout
                # (fl_tpu.ops.stem_vjp)
                from fl_tpu.ops.stem_vjp import StemConv

                conv1 = StemConv(32, dtype=self.dtype, name="conv1")
            else:
                conv1 = nn.Conv(32, (3, 3), padding="SAME",
                                dtype=self.dtype, name="conv1")
            if self.fast_pool_bwd:
                # identical forward (reduce_window max), but the VJP is
                # reshape+argmax instead of TPU's slow select-and-scatter —
                # bit-exact incl. tie-breaking (fl_tpu.ops.pool_vjp)
                from fl_tpu.ops.pool_vjp import max_pool_2x2 as pool
            else:
                pool = lambda v: nn.max_pool(v, (2, 2), strides=(2, 2))  # noqa: E731

        captures = {}

        def tap(name, t):
            if dp_capture:
                captures[name] = t
            return t

        def pert(name, t):
            if dp_perturb is not None:
                t = t + dp_perturb[name].astype(t.dtype)
            return t

        x = x.astype(self.dtype)
        x = tap("conv1", x)
        x = pert("conv1", conv1(x))
        x = nn.relu(x)
        x = pool(x)
        if self.fast_conv2_bwd:
            from fl_tpu.ops.conv_vjp import TapGemmConv

            conv2 = TapGemmConv(64, dtype=self.dtype, name="conv2")
        else:
            conv2 = nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype,
                            name="conv2")
        x = tap("conv2", x)
        x = pert("conv2", conv2(x))
        x = nn.relu(x)
        x = pool(x)
        x = x.reshape((x.shape[0], -1))  # (B, 7*7*64)
        x = tap("fc1", x)
        x = pert("fc1", nn.Dense(128, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = tap("fc2", x)
        x = pert("fc2", nn.Dense(self.num_classes, dtype=self.dtype,
                                 name="fc2")(x))
        out = x.astype(jnp.float32)
        return (out, captures) if dp_capture else out
