"""The declarative feature-composition matrix (VERDICT r3 #5 + #4).

Three layers of enforcement:

1. **Partition property**: every pair of engine feature families is
   exactly one of impossible-by-construction, refused-by-a-rule, or
   declared-composable. A new family that forgets to declare its row
   fails here before it can ship an unvalidated composition.
2. **Refusals fire**: constructing an engine with both features of a
   refused pair active raises ValueError (sampled message pins included).
3. **Compositions construct**: every declared-composable pair actually
   builds a validated engine (with its dependencies), and every feature
   family runs ONE round on the 8-device mesh equal to the single-device
   result — the mesh-equality completeness VERDICT r3 #4 asks for.
"""

import copy
import dataclasses
import itertools

import numpy as np
import pytest

from fl_tpu.core.types import PrivacyConfig
from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models import create_model
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig
from fl_tpu.orchestration.features import (
    FEATURES,
    RULES,
    composable_pairs,
    impossible_pairs,
    refused_pairs,
    validate_config,
)

N_CLIENTS, SPC = 8, 16


@pytest.fixture(scope="module")
def arrays():
    splits = load_dataset("mnist", n_train_synth=N_CLIENTS * SPC,
                          n_test_synth=64)
    return make_federated_arrays(splits, num_clients=N_CLIENTS,
                                 strategy="iid", samples_per_client=SPC,
                                 seed=0)


def _merge(dst, src):
    for k, v in src.items():
        if k == "training" and "training" in dst:
            merged = dict(dst["training"])
            for tk, tv in v.items():
                assert merged.get(tk, tv) == tv, \
                    f"fragment clash on training.{tk}"
                merged[tk] = tv
            dst["training"] = merged
        else:
            assert dst.get(k, v) == v, f"fragment clash on {k}"
            dst[k] = v
    return dst


def _build_config(feature_names, with_needs=True):
    """RoundEngineConfig activating the given features via their declared
    fragments (plus hard dependencies)."""
    names = list(feature_names)
    if with_needs:
        for n in list(names):
            for need in FEATURES[n].needs:
                if need not in names:
                    names.append(need)
    kwargs: dict = {}
    for n in names:
        _merge(kwargs, copy.deepcopy(dict(FEATURES[n].fragment)))
    if kwargs.pop("privacy", None) or any(
            FEATURES[n].axis == "dp_mode" for n in names):
        kwargs["privacy"] = PrivacyConfig(
            epsilon=1000.0, delta=1e-5, max_grad_norm=1.0,
            noise_multiplier=6.0)
    tkw = kwargs.pop("training", {})
    kwargs["training"] = FederatedTrainingConfig(
        local_epochs=1, batch_size=8, learning_rate=0.05, **tkw)
    if "optimizer_type" not in tkw:
        kwargs["training"] = dataclasses.replace(
            kwargs["training"], optimizer_type="adam")
    return RoundEngineConfig(max_clients=N_CLIENTS, seed=3, **kwargs)


def test_every_pair_is_classified():
    """The partition property: refused ∪ impossible ∪ composable covers
    all C(n,2) pairs with no overlap."""
    names = list(FEATURES)
    allp = {frozenset(p) for p in itertools.combinations(names, 2)}
    ref, imp, comp = refused_pairs(), impossible_pairs(), composable_pairs()
    assert ref | imp | comp == allp
    assert not (ref & comp)
    assert not (imp & comp)
    # every rule's refuses entries reference declared features
    for r in RULES:
        for a, b in r.refuses:
            assert a in FEATURES and b in FEATURES, (a, b)


def test_refused_pairs_raise(arrays):
    """Every constructible refused pair raises ValueError at engine
    validation time."""
    model = create_model("simple_cnn")
    checked = 0
    for pair in sorted(refused_pairs(), key=sorted):
        a, b = sorted(pair)
        try:
            cfg = _build_config([a, b], with_needs=False)
        except AssertionError:
            continue  # fragments clash structurally (cannot co-configure)
        with pytest.raises(ValueError):
            FederatedRoundEngine(model, arrays, cfg)
        checked += 1
    assert checked >= 40  # the bulk of the matrix is exercised


def test_refusal_messages_preserved():
    """Sample message pins: the original if-chain's wording survives the
    declarative refactor (other suites pin more substrings)."""
    cases = [
        (["scaffold", "dp_delta"], "not privatized"),
        (["fednova", "robust_aggregation"], "reweighting of the FedAvg"),
        (["qffl", "server_optimizer"], "owns the server step"),
        (["uplink_compression", "client_dp"], "error-feedback residual"),
        (["feddyn", "downlink_compression"], "first-order identity"),
        (["adaptive_clipping", "dp_sgd"], "requires dp_mode='client_dp'"),
    ]
    for names, substr in cases:
        cfg = _build_config(names, with_needs=False)
        with pytest.raises(ValueError, match=substr):
            validate_config(cfg, N_CLIENTS)


def test_composable_pairs_construct(arrays):
    """Every declared-composable pair builds a validated engine (with its
    dependencies resolved). Catches rules whose predicate and declared
    `refuses` drift apart."""
    model = create_model("simple_cnn")
    for pair in sorted(composable_pairs(), key=sorted):
        a, b = sorted(pair)
        cfg = _build_config([a, b])
        eng = FederatedRoundEngine(model, arrays, cfg)
        assert eng is not None, (a, b)


# --- per-family mesh-equality completeness (VERDICT r3 #4) ----------------

# Families whose round output under the mesh is asserted equal to the
# single-device run. "exact" = allclose on weights; "finite" = finiteness
# only (noise reduction order differs across shards).
_MESH_MODE = {
    "dp_delta": "exact",
    "dp_sgd": "exact",
    "client_dp": "exact",
    "dp_ftrl": "exact",
    "distributed_dp": "exact",
    "uplink_compression": "exact",
    "downlink_compression": "exact",
    "robust_aggregation": "exact",
    "secure_aggregation": "exact",
    "server_optimizer": "exact",
    "fednova": "exact",
    "scaffold": "exact",
    "feddyn": "exact",
    "qffl": "exact",
    "adaptive_clipping": "exact",
    "audit_injection": "exact",
    "peft": "exact",
    "fedprox": "exact",
    "param_storage_bf16": "exact",
    "pld_accountant": "exact",
}


def test_mesh_matrix_is_complete():
    """Every declared feature family has a mesh-equality row — a new
    family must add one (or the parametrized test below never covers
    it)."""
    assert set(_MESH_MODE) == set(FEATURES)


@pytest.mark.parametrize("feature", sorted(_MESH_MODE))
def test_feature_on_mesh_matches_single_device(feature, arrays, mesh8):
    """One round of each feature family, sharded over the 8-device mesh,
    equals the single-device round — the per-family generalization of
    test_mesh_engine_and_wire.py's FedAvg check."""
    def build(mesh):
        return FederatedRoundEngine(
            create_model("simple_cnn"), arrays, _build_config([feature]),
            mesh=mesh)

    single, sharded = build(None), build(mesh8)
    mask = np.ones(N_CLIENTS, np.float32)
    r1 = single.run_round(mask=mask, evaluate=False)
    r2 = sharded.run_round(mask=mask, evaluate=False)
    w1, w2 = single.get_model_weights(), sharded.get_model_weights()
    if _MESH_MODE[feature] == "exact":
        assert r1.train_loss == pytest.approx(r2.train_loss, rel=1e-4)
        for k in w1:
            np.testing.assert_allclose(
                np.asarray(w2[k]), np.asarray(w1[k]), rtol=1e-4, atol=1e-5,
                err_msg=f"{feature}: {k}")
    else:
        assert np.isfinite(r2.train_loss)
        for k in w2:
            assert np.all(np.isfinite(np.asarray(w2[k]))), (feature, k)
