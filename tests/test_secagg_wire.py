"""Deployment-grade secure aggregation over the gRPC wire
(fl_tpu.services.secagg_wire + servicer roster protocol)."""

import time

import numpy as np
import pytest

from fl_tpu.services.secagg_wire import (
    generate_keypair,
    mask_vector,
    mask_weights,
    unmask_aggregate,
)


def _keyed_parties(n):
    ids = [f"c{i}" for i in range(n)]
    keys = {cid: generate_keypair() for cid in ids}
    pubs = [(cid, keys[cid][1]) for cid in ids]
    return ids, keys, pubs


def test_dh_pair_masks_cancel_across_roster():
    """Each party derives its mask from DH shared secrets only; the
    roster-wide sum cancels to float precision."""
    ids, keys, pubs = _keyed_parties(4)
    D = 513
    total = np.zeros(D, np.float32)
    for cid in ids:
        total += mask_vector(keys[cid][0], cid, pubs, round_number=7,
                             dim=D, scale=3.0)
    assert np.abs(total).max() < 1e-3
    # and the masks differ per round (seed binds the round number)
    m1 = mask_vector(keys[ids[0]][0], ids[0], pubs, 7, D)
    m2 = mask_vector(keys[ids[0]][0], ids[0], pubs, 8, D)
    assert not np.allclose(m1, m2)


def test_mask_unmask_recovers_weighted_mean():
    """3 masked payloads aggregate to the sample-weighted mean while each
    individual payload is mask-dominated."""
    from fl_tpu.core.types import ModelUpdate

    ids, keys, pubs = _keyed_parties(3)
    rng = np.random.default_rng(0)
    weights = {cid: {"w": rng.normal(0, 0.01, (8, 4)).astype(np.float32),
                     "b": rng.normal(0, 0.01, (4,)).astype(np.float32)}
               for cid in ids}
    n = {"c0": 10, "c1": 30, "c2": 60}

    updates = []
    for cid in ids:
        masked = mask_weights(weights[cid], n[cid], keys[cid][0], cid,
                              pubs, round_number=3, scale=1.0)
        # individual payload is nowhere near n·θ (masks dominate)
        assert np.abs(masked["w"] - n[cid] * weights[cid]["w"]).max() > 0.05
        updates.append(ModelUpdate(
            client_id=cid, round_number=3, model_weights=masked,
            num_samples=n[cid], training_loss=0.5))

    agg = unmask_aggregate(updates)
    expect = {
        k: sum(n[cid] * weights[cid][k] for cid in ids) / sum(n.values())
        for k in ("w", "b")
    }
    for k in expect:
        np.testing.assert_allclose(agg.model_weights[k], expect[k],
                                   atol=1e-4, err_msg=k)


def test_roster_protocol_and_masked_round_over_grpc():
    """Loopback wire test: 3 clients register X25519 pubkeys, the
    coordinator freezes the roster at min_clients, each client submits a
    masked sample-scaled payload, and the aggregated global model equals
    the true weighted mean — the server never saw an unmasked update."""
    from fl_tpu.core.types import (
        ClientCapabilities,
        ComputePowerLevel,
        ModelUpdate,
        RoundConfig,
    )
    from fl_tpu.services.grpc_client import FederatedLearningClient
    from fl_tpu.services.grpc_server import (
        CoordinatorGRPCServer,
        FederatedLearningServicer,
    )
    from fl_tpu.services.secagg_wire import PUBKEY_METADATA_KEY

    servicer = FederatedLearningServicer(
        round_config=RoundConfig(min_clients=3, max_clients=3,
                                 local_epochs=1, batch_size=8),
        secure_aggregation=True,
    )
    srv = CoordinatorGRPCServer(servicer, host="127.0.0.1", port=0)
    port = srv.start()
    caps = ClientCapabilities(compute_power=ComputePowerLevel.MEDIUM,
                              network_bandwidth=10, available_samples=100)
    ids = ["sa_a", "sa_b", "sa_c"]
    keys = {cid: generate_keypair() for cid in ids}
    clients = {}
    try:
        for cid in ids:
            c = FederatedLearningClient(host="127.0.0.1", port=port,
                                        client_id=cid, timeout_s=10.0)
            c.connect()
            c.register(caps, metadata={
                PUBKEY_METADATA_KEY: keys[cid][1].hex()})
            clients[cid] = c

        ready, peers = clients["sa_a"].get_secagg_roster(0)
        assert ready and {p[0] for p in peers} == set(ids)

        # true local models + sample counts (never sent in the clear)
        gm = clients["sa_a"].get_global_model()
        rnd = gm.round_number
        base = {k: np.asarray(v) for k, v in gm.model_weights.items()}
        rng = np.random.default_rng(1)
        true = {cid: {k: v + rng.normal(0, 0.01, v.shape).astype(np.float32)
                      for k, v in base.items()} for cid in ids}
        n = {"sa_a": 50, "sa_b": 100, "sa_c": 150}
        for cid in ids:
            masked = mask_weights(true[cid], n[cid], keys[cid][0], cid,
                                  peers, rnd, scale=1.0)
            ack = clients[cid].submit_model_update(ModelUpdate(
                client_id=cid, round_number=rnd, model_weights=masked,
                num_samples=n[cid], training_loss=1.0))
            assert ack["success"], ack["message"]

        deadline = time.time() + 30
        while servicer.current_round == rnd and time.time() < deadline:
            time.sleep(0.2)
        assert servicer.current_round == rnd + 1, "aggregation did not fire"

        agg = servicer.global_model.model_weights
        total = sum(n.values())
        for k in base:
            expect = sum(n[cid] * true[cid][k] for cid in ids) / total
            np.testing.assert_allclose(np.asarray(agg[k]), expect,
                                       atol=1e-3, err_msg=k)
    finally:
        for c in clients.values():
            c.close()
        srv.stop()


def test_roster_waits_for_min_clients():
    from fl_tpu.core.types import (
        ClientCapabilities,
        ComputePowerLevel,
        RoundConfig,
    )
    from fl_tpu.services.grpc_client import FederatedLearningClient
    from fl_tpu.services.grpc_server import (
        CoordinatorGRPCServer,
        FederatedLearningServicer,
    )
    from fl_tpu.services.secagg_wire import PUBKEY_METADATA_KEY

    servicer = FederatedLearningServicer(
        round_config=RoundConfig(min_clients=2, max_clients=4),
        secure_aggregation=True,
    )
    srv = CoordinatorGRPCServer(servicer, host="127.0.0.1", port=0)
    port = srv.start()
    caps = ClientCapabilities(compute_power=ComputePowerLevel.MEDIUM,
                              network_bandwidth=10, available_samples=10)
    try:
        with FederatedLearningClient(host="127.0.0.1", port=port,
                                     client_id="solo",
                                     timeout_s=10.0) as c:
            sk, pk = generate_keypair()
            c.register(caps, metadata={PUBKEY_METADATA_KEY: pk.hex()})
            ready, peers = c.get_secagg_roster(0)
            assert not ready and peers == []  # one key < min_clients=2
    finally:
        srv.stop()


def test_secagg_disabled_coordinator_reports_not_enabled():
    from fl_tpu.core.types import RoundConfig
    from fl_tpu.services.grpc_client import FederatedLearningClient
    from fl_tpu.services.grpc_server import (
        CoordinatorGRPCServer,
        FederatedLearningServicer,
    )

    servicer = FederatedLearningServicer(round_config=RoundConfig())
    srv = CoordinatorGRPCServer(servicer, host="127.0.0.1", port=0)
    port = srv.start()
    try:
        with FederatedLearningClient(host="127.0.0.1", port=port,
                                     client_id="x", timeout_s=10.0) as c:
            ready, peers = c.get_secagg_roster(0)
            assert not ready
    finally:
        srv.stop()


def _direct_servicer(min_clients=2, max_clients=4):
    from fl_tpu.core.types import RoundConfig
    from fl_tpu.services.grpc_server import FederatedLearningServicer

    return FederatedLearningServicer(
        round_config=RoundConfig(min_clients=min_clients,
                                 max_clients=max_clients),
        secure_aggregation=True,
    )


def _register(servicer, cid, pub):
    from fl_tpu.services import federated_learning_pb2 as pb
    from fl_tpu.services.secagg_wire import PUBKEY_METADATA_KEY

    req = pb.ClientRegistration(client_id=cid)
    req.metadata[PUBKEY_METADATA_KEY] = pub.hex()
    return servicer.RegisterClient(req, None)


def test_pubkey_replacement_rejected_while_roster_live():
    """ADVICE (high): a mid-round re-registration must not swap the stored
    pubkey out from under a frozen roster — different roster fetchers would
    otherwise derive non-cancelling masks and silently corrupt the model."""
    from fl_tpu.services import federated_learning_pb2 as pb

    servicer = _direct_servicer(min_clients=2)
    (sk_a, pk_a), (sk_b, pk_b) = generate_keypair(), generate_keypair()
    assert _register(servicer, "a", pk_a).success
    assert _register(servicer, "b", pk_b).success
    roster = servicer.GetSecAggRoster(
        pb.SecAggRosterRequest(client_id="a", round_number=0), None)
    assert roster.ready

    # a re-registration with a FRESH key while the roster is live: rejected
    _, pk_a2 = generate_keypair()
    resp = _register(servicer, "a", pk_a2)
    assert not resp.success
    assert "roster" in resp.message
    # same key re-registration (true restart that kept its key): accepted
    assert _register(servicer, "a", pk_a).success

    # once no roster references the client, a key change is accepted
    servicer.secagg_rosters.clear()
    assert _register(servicer, "a", pk_a2).success


def test_roster_serves_frozen_snapshot_keys():
    """The roster response must come from the freeze-time snapshot, not a
    live lookup of self.clients."""
    from fl_tpu.services import federated_learning_pb2 as pb

    servicer = _direct_servicer(min_clients=2)
    (_, pk_a), (_, pk_b) = generate_keypair(), generate_keypair()
    _register(servicer, "a", pk_a)
    _register(servicer, "b", pk_b)
    r1 = servicer.GetSecAggRoster(
        pb.SecAggRosterRequest(client_id="a", round_number=0), None)
    assert r1.ready
    # simulate post-freeze registry mutation (the bug class the snapshot
    # defends against)
    _, pk_evil = generate_keypair()
    servicer.clients["a"]["secagg_pubkey"] = pk_evil
    r2 = servicer.GetSecAggRoster(
        pb.SecAggRosterRequest(client_id="b", round_number=0), None)
    keys = {p.client_id: bytes(p.public_key) for p in r2.peers}
    assert keys["a"] == pk_a  # the snapshot, not the mutated registry


def test_secure_aggregation_crash_clears_round_for_retry():
    """ADVICE (low): a malformed roster payload (mismatched weight keys)
    must not leave the round stalled in a silent retry hot loop — the
    crash is logged and the round's state cleared."""
    from fl_tpu.core.types import ModelUpdate
    from fl_tpu.services import federated_learning_pb2 as pb

    servicer = _direct_servicer(min_clients=2, max_clients=2)
    (_, pk_a), (_, pk_b) = generate_keypair(), generate_keypair()
    _register(servicer, "a", pk_a)
    _register(servicer, "b", pk_b)
    roster = servicer.GetSecAggRoster(
        pb.SecAggRosterRequest(client_id="a", round_number=0), None)
    assert roster.ready

    conv = servicer.converter
    good = ModelUpdate(client_id="a", round_number=0,
                       model_weights={"w": np.ones((2, 2), np.float32)},
                       num_samples=10, training_loss=0.0)
    bad = ModelUpdate(client_id="b", round_number=0,
                      model_weights={"DIFFERENT": np.ones(3, np.float32)},
                      num_samples=10, training_loss=0.0)
    servicer.SubmitModelUpdate(conv.model_update_to_proto(good), None)
    servicer.SubmitModelUpdate(conv.model_update_to_proto(bad), None)

    deadline = time.time() + 20
    while time.time() < deadline:
        with servicer._lock:
            if (not servicer._aggregating
                    and 0 not in servicer.pending_updates
                    and 0 not in servicer.secagg_rosters):
                break
        time.sleep(0.05)
    with servicer._lock:
        assert not servicer._aggregating
        assert 0 not in servicer.pending_updates, "round not cleared"
        assert 0 not in servicer.secagg_rosters, "roster not cleared"
    # the round did NOT advance (no silent bogus aggregate)
    assert servicer.current_round == 0
