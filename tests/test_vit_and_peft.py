"""FederatedViT model family + parameter-efficient fine-tuning (LoRA /
freezing): fl_tpu/models/vit.py, fl_tpu/fl/peft.py, engine
trainable_patterns."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.core import pytree as pt
from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl import peft
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models import create_model
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

TINY_VIT = dict(patch_size=8, embed_dim=32, depth=1, num_heads=2,
                mlp_ratio=2)


# ===========================================================================
# model family
# ===========================================================================

def test_vit_in_factory_forward_shape_and_info():
    model = create_model("federated_vit")
    v = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    logits, _ = model.apply(v, x, train=False)
    assert logits.shape == (2, 10)
    assert logits.dtype == jnp.float32
    info = model.get_model_info(v)
    # CNN-zoo scale at the defaults, and LayerNorm-only (no batch_stats)
    assert 3e5 < info["parameters"] < 1.5e6
    assert "batch_stats" not in v


def test_vit_rejects_indivisible_patch():
    model = create_model("federated_vit", input_shape=(30, 30, 3))
    with pytest.raises(ValueError, match="divisible"):
        model.init(jax.random.PRNGKey(0))


def test_vit_trains_in_engine():
    splits = load_dataset("cifar10", n_train_synth=128, n_test_synth=32)
    fa = make_federated_arrays(splits, num_clients=4, strategy="iid",
                               samples_per_client=32, seed=0)
    model = create_model("federated_vit", **TINY_VIT)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=1, batch_size=8,
                                         learning_rate=1e-3),
        seed=0, max_clients=4)
    eng = FederatedRoundEngine(model, fa, cfg)
    first = eng.run_round(evaluate=False)
    last = None
    for _ in range(3):
        last = eng.run_round(evaluate=False)
    assert np.isfinite(last.train_loss)
    assert last.train_loss < first.train_loss


def test_vit_flops_estimate_positive():
    from fl_tpu.models.vit import FederatedViT

    assert FederatedViT.flops_per_sample() > 1e6


# ===========================================================================
# LoRA
# ===========================================================================

def test_lora_starts_at_base_function():
    """B=0 at init: the rank-r model must compute the same function as the
    adapter path contributing exactly nothing."""
    model = create_model("federated_vit", lora_rank=2, **TINY_VIT)
    v = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 32, 32, 3)),
                    jnp.float32)
    base, _ = model.apply(v, x, train=False)
    # zero lora_a too: output must be identical (B=0 already kills A's
    # contribution)
    flat = pt.flatten_dict(v["params"])
    assert any(k.endswith("lora_a") for k in flat)
    zeroed = {k: (jnp.zeros_like(a) if k.endswith("lora_a") else a)
              for k, a in flat.items()}
    v2 = dict(v, params=pt.unflatten_dict(zeroed))
    out2, _ = model.apply(v2, x, train=False)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out2))


def test_merge_lora_preserves_function():
    model = create_model("federated_vit", lora_rank=2, **TINY_VIT)
    v = model.init(jax.random.PRNGKey(0))
    # give the adapters real content
    flat = pt.flatten_dict(v["params"])
    rng = np.random.default_rng(1)
    flat = {k: (jnp.asarray(rng.normal(0, 0.05, a.shape), a.dtype)
                if "lora_" in k else a)
            for k, a in flat.items()}
    v = dict(v, params=pt.unflatten_dict(flat))
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    out, _ = model.apply(v, x, train=False)
    merged = dict(v, params=peft.merge_lora(v["params"]))
    out_m, _ = model.apply(merged, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_m),
                               rtol=1e-5, atol=1e-5)
    # and the merged adapters are zeroed (plain-Dense cost at deploy time)
    mflat = pt.flatten_dict(merged["params"])
    assert all(float(jnp.abs(a).max()) == 0.0
               for k, a in mflat.items() if "lora_" in k)


def test_trainable_mask_patterns_and_errors():
    model = create_model("federated_vit", lora_rank=2, **TINY_VIT)
    v = model.init(jax.random.PRNGKey(0))
    mask = peft.trainable_mask(v["params"], peft.lora_trainable_patterns())
    tr, tot = peft.count_trainable(mask)
    assert 0 < tr < 0.35 * tot  # adapters + LN + head are a small slice
    flat = pt.flatten_dict(mask)
    assert all(float(m.min()) == 1.0 for k, m in flat.items()
               if "lora_" in k or "/head/" in k or k.startswith("head/"))
    assert all(float(m.max()) == 0.0 for k, m in flat.items()
               if k.endswith("patch_embed/kernel"))
    with pytest.raises(ValueError, match="at least one"):
        peft.trainable_mask(v["params"], ())
    with pytest.raises(ValueError, match="no parameter path"):
        peft.trainable_mask(v["params"], ("does_not_exist_xyz",))


# ===========================================================================
# engine freezing
# ===========================================================================

def _cifar_engine(model, patterns, seed=0):
    splits = load_dataset("cifar10", n_train_synth=128, n_test_synth=32)
    fa = make_federated_arrays(splits, num_clients=4, strategy="iid",
                               samples_per_client=32, seed=seed)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=1, batch_size=8,
                                         learning_rate=1e-3),
        trainable_patterns=patterns, seed=seed, max_clients=4)
    return FederatedRoundEngine(model, fa, cfg)


def test_engine_freezing_keeps_frozen_leaves_bit_stable():
    model = create_model("federated_vit", lora_rank=2, **TINY_VIT)
    eng = _cifar_engine(model, peft.lora_trainable_patterns())
    init = {k: np.asarray(v).copy() for k, v in
            pt.flatten_dict(eng.global_variables["params"]).items()}
    mask = pt.flatten_dict(eng._grad_mask)
    for _ in range(2):
        r = eng.run_round(evaluate=False)
    assert np.isfinite(r.train_loss)
    after = pt.flatten_dict(eng.global_variables["params"])
    moved = unchanged = 0
    for k in init:
        if float(mask[k].max()) == 0.0:
            np.testing.assert_array_equal(
                init[k], np.asarray(after[k]),
                err_msg=f"frozen leaf {k} moved")
        else:
            moved += int(not np.array_equal(init[k], np.asarray(after[k])))
            unchanged += int(np.array_equal(init[k], np.asarray(after[k])))
    assert moved > 0  # the trainable slice actually trained


def test_engine_head_only_freezing_simple_cnn():
    model = create_model("simple_cnn", input_shape=(32, 32, 3))
    eng = _cifar_engine(model, ("(^|/)fc2/",))
    init = {k: np.asarray(v).copy() for k, v in
            pt.flatten_dict(eng.global_variables["params"]).items()}
    eng.run_round(evaluate=False)
    after = pt.flatten_dict(eng.global_variables["params"])
    for k in init:
        if "fc2" in k:
            assert not np.array_equal(init[k], np.asarray(after[k])), k
        else:
            np.testing.assert_array_equal(init[k], np.asarray(after[k]),
                                          err_msg=k)


def test_freezing_refuses_drift_correctors():
    splits = load_dataset("cifar10", n_train_synth=64, n_test_synth=32)
    fa = make_federated_arrays(splits, num_clients=4, strategy="iid",
                               samples_per_client=16, seed=0)
    model = create_model("federated_vit", lora_rank=2, **TINY_VIT)
    with pytest.raises(ValueError, match="drift"):
        FederatedRoundEngine(model, fa, RoundEngineConfig(
            training=FederatedTrainingConfig(
                local_epochs=1, batch_size=8, optimizer_type="sgd",
                momentum=0.0),
            trainable_patterns=("lora_",), scaffold=True, max_clients=4))


def test_freezing_on_mesh_matches_single_device(mesh8):
    splits = load_dataset("cifar10", n_train_synth=256, n_test_synth=32)
    model_kw = dict(lora_rank=2, **TINY_VIT)

    def build(mesh):
        fa = make_federated_arrays(splits, num_clients=8, strategy="iid",
                                   samples_per_client=32, seed=0)
        cfg = RoundEngineConfig(
            training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
            trainable_patterns=peft.lora_trainable_patterns(),
            seed=0, max_clients=8)
        return FederatedRoundEngine(
            create_model("federated_vit", **model_kw), fa, cfg, mesh=mesh)

    single, sharded = build(None), build(mesh8)
    mask = np.ones(8, np.float32)
    r1 = single.run_round(mask=mask, evaluate=False)
    r2 = sharded.run_round(mask=mask, evaluate=False)
    assert r1.train_loss == pytest.approx(r2.train_loss, rel=1e-4)
    w1, w2 = single.get_model_weights(), sharded.get_model_weights()
    for k in w1:
        np.testing.assert_allclose(np.asarray(w1[k]), np.asarray(w2[k]),
                                   rtol=1e-4, atol=1e-5)
