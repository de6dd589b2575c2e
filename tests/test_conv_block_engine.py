"""Engine-level coverage for the fused conv segment (VERDICT r4 #5/r5 #3).

The fused Pallas conv segment had 15 model/op-level numerics tests but no
test running a full FederatedRoundEngine round with it — the integration
surface where the round-4 perf question lived. These run the delta-DP
bench configuration (tiny shapes) with fused_conv_block False / True /
"residual" and assert the final global models and metrics agree, on a
single device and under the 8-virtual-device client mesh (shard_map +
psum superstep, packed custom_vmap path under vmap-of-shard).

The fused paths are not bit-equal to the unfused flax chain (conv GEMMs
accumulate in different orders; biases add in f32 vs bf16) — tolerances
reflect one-round bf16 drift. conv_stack_res additionally packs
the conv taps into GEMM K (different f32 accumulation order, ±1 bf16
ulp vs conv_stack).
"""

import jax
import numpy as np
import pytest

from fl_tpu.core.types import PrivacyConfig
from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models import create_model
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

import jax.numpy as jnp


@pytest.fixture(scope="module")
def arrays():
    splits = load_dataset("mnist", n_train_synth=256, n_test_synth=64)
    return make_federated_arrays(splits, num_clients=4, strategy="iid",
                                 samples_per_client=32, seed=0)


def _run_round(arrays, fused, mesh=None):
    model = create_model("simple_cnn", dtype=jnp.bfloat16,
                         fused_conv_block=fused)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=1, batch_size=16,
                                         optimizer_type="adam"),
        dp_mode="delta",
        privacy=PrivacyConfig(epsilon=8.0, delta=1e-5, max_grad_norm=1.0),
        epsilon_per_round=1.0,
        delta_per_round=1e-7,
        min_clients=2,
        seed=0,
    )
    eng = FederatedRoundEngine(model, arrays, cfg, mesh=mesh)
    res = eng.run_round(evaluate=False)
    return jax.device_get(eng.global_variables["params"]), res


def _assert_close(pa, pb, rtol, atol):
    fa = {jax.tree_util.keystr(k): v for k, v
          in jax.tree_util.tree_leaves_with_path(pa)}
    fb = {jax.tree_util.keystr(k): v for k, v
          in jax.tree_util.tree_leaves_with_path(pb)}
    assert sorted(fa) == sorted(fb)
    for k in sorted(fa):
        np.testing.assert_allclose(
            np.asarray(fa[k], np.float32), np.asarray(fb[k], np.float32),
            rtol=rtol, atol=atol, err_msg=k)


def test_fused_round_matches_unfused(arrays):
    p_ref, r_ref = _run_round(arrays, fused=False)
    p_fused, r_fused = _run_round(arrays, fused=True)
    # one Adam round of bf16 compute: updates are O(lr)=1e-3; the two
    # formulations differ only in f32-accumulation order inside the convs,
    # but a bf16 tie flipped by that order can move an Adam step by up to
    # ~lr/2 on isolated elements (measured: 27/401k elements at 4.2e-4)
    _assert_close(p_ref, p_fused, rtol=2e-2, atol=1e-3)
    assert r_ref.participating_clients == r_fused.participating_clients
    np.testing.assert_allclose(r_ref.train_loss, r_fused.train_loss,
                               rtol=5e-2)


def test_residual_round_matches_fused(arrays):
    """conv_stack vs conv_stack_res inside the engine: same math, taps
    packed into GEMM K (different f32 accumulation order, can move
    outputs by a bf16 ulp) — near-equality at the one-round level."""
    p_a, r_a = _run_round(arrays, fused=True)
    p_b, r_b = _run_round(arrays, fused="residual")
    _assert_close(p_a, p_b, rtol=2e-2, atol=1e-3)
    np.testing.assert_allclose(r_a.train_loss, r_b.train_loss, rtol=5e-2)


def test_fused_round_on_mesh_matches_single_device(arrays, mesh8):
    """The packed custom_vmap path under shard_map: same round result as
    the single-device program (the client axis shards 4 clients over...
    4 of 8 devices is refused — pad to 8 clients)."""
    splits = load_dataset("mnist", n_train_synth=512, n_test_synth=64)
    arr8 = make_federated_arrays(splits, num_clients=8, strategy="iid",
                                 samples_per_client=32, seed=0)
    p_single, r_single = _run_round(arr8, fused="residual")
    p_mesh, r_mesh = _run_round(arr8, fused="residual", mesh=mesh8)
    # cross-device psum reassociates the FedAvg sum: near-equal, not bit
    _assert_close(p_single, p_mesh, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(r_single.train_loss, r_mesh.train_loss,
                               rtol=1e-3)


def test_fused_refuses_ghost_dp_taps(arrays):
    model = create_model("simple_cnn", fused_conv_block="residual")
    x = jnp.zeros((2, 28, 28, 1), jnp.float32)
    with pytest.raises(ValueError, match="fused_conv_block"):
        model.module.init(jax.random.PRNGKey(0), x, dp_capture=True)
