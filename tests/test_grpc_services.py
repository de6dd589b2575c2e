"""gRPC service loopback tests — coordinator + client over localhost,
mirroring the reference's in-process integration style
(federated_simulation.py:309-318) as real pytest cases."""

import threading
import time

import numpy as np
import pytest

from fl_tpu.core.types import (
    ClientCapabilities,
    ComputePowerLevel,
    ModelUpdate,
    PrivacyConfig,
    RoundConfig,
)
from fl_tpu.services.grpc_client import FederatedLearningClient, GRPCClientError
from fl_tpu.services.grpc_server import (
    CoordinatorGRPCServer,
    FederatedLearningServicer,
)


@pytest.fixture(scope="module")
def server():
    servicer = FederatedLearningServicer(
        round_config=RoundConfig(min_clients=2, local_epochs=1,
                                 privacy_config=PrivacyConfig(1.0, 1e-5)),
    )
    srv = CoordinatorGRPCServer(servicer, host="127.0.0.1", port=0)
    port = srv.start()
    yield servicer, port
    srv.stop()


def make_client(port, cid):
    c = FederatedLearningClient(host="127.0.0.1", port=port, client_id=cid,
                                timeout_s=10.0)
    c.connect()
    return c


CAPS = ClientCapabilities(
    compute_power=ComputePowerLevel.MEDIUM,
    network_bandwidth=25,
    available_samples=500,
    supported_models=["simple_cnn"],
)


def test_register_and_health(server):
    servicer, port = server
    with FederatedLearningClient(host="127.0.0.1", port=port,
                                 client_id="reg1") as c:
        info = c.register(CAPS)
        assert info["client_id"] == "reg1"
        assert "simple_cnn" in info["supported_models"]
        assert c.health_check()
    assert "reg1" in servicer.clients


def test_full_round_over_grpc(server):
    """Two clients: register → join → download model → submit perturbed
    updates → coordinator aggregates → round advances → new global model is
    the weighted average."""
    servicer, port = server
    c1 = make_client(port, "rt_a")
    c2 = make_client(port, "rt_b")
    try:
        c1.register(CAPS)
        c2.register(CAPS)
        cfg = c1.join_training_round()
        assert cfg.min_clients == 2
        c2.join_training_round()

        gm = c1.get_global_model()
        rnd = gm.round_number
        w = {k: np.asarray(v) for k, v in gm.model_weights.items()}

        def perturbed(eps):
            return {k: v + eps for k, v in w.items()}

        r1 = c1.submit_model_update(ModelUpdate(
            client_id="rt_a", round_number=rnd,
            model_weights=perturbed(0.01), num_samples=100,
            training_loss=0.9))
        assert r1["success"]
        r2 = c2.submit_model_update(ModelUpdate(
            client_id="rt_b", round_number=rnd,
            model_weights=perturbed(0.03), num_samples=300,
            training_loss=0.7))
        assert r2["success"]

        deadline = time.time() + 30
        while time.time() < deadline:
            status = c1.get_training_status()
            if status.current_round == rnd + 1:
                break
            time.sleep(0.2)
        else:
            pytest.fail("aggregation did not advance the round")

        gm2 = c1.get_global_model()
        assert gm2.round_number == rnd  # model carries the aggregated round's number
        key = next(iter(w))
        # weighted avg: 0.25*0.01 + 0.75*0.03 = 0.025
        np.testing.assert_allclose(
            np.asarray(gm2.model_weights[key]), w[key] + 0.025, atol=1e-5
        )
    finally:
        c1.close()
        c2.close()


def test_stale_round_rejected(server):
    servicer, port = server
    with FederatedLearningClient(host="127.0.0.1", port=port,
                                 client_id="stale") as c:
        c.register(CAPS)
        gm = c.get_global_model()
        resp = c.submit_model_update(ModelUpdate(
            client_id="stale", round_number=gm.round_number + 999,
            model_weights={k: np.asarray(v)
                           for k, v in gm.model_weights.items()},
            num_samples=10, training_loss=1.0))
        assert not resp["success"]
        assert "stale" in resp["message"] or "round" in resp["message"]


def test_status_and_metrics(server):
    servicer, port = server
    with FederatedLearningClient(host="127.0.0.1", port=port,
                                 client_id="obs") as c:
        c.register(CAPS)
        status = c.get_training_status()
        assert status.current_round >= 0
        assert status.active_clients >= 1


def test_unconnected_client_raises():
    c = FederatedLearningClient(client_id="x")
    with pytest.raises(GRPCClientError, match="not connected"):
        c.get_training_status()


def test_hex_torch_interop_submission(server):
    """A reference-style client sends torch.save→hex bytes; the coordinator
    must decode them (grpc_utils.py:126-127 interop path)."""
    torch = pytest.importorskip("torch")
    import io

    from fl_tpu.services import federated_learning_pb2 as pb
    from fl_tpu.services.grpc_utils import ProtobufConverter

    servicer, port = server
    conv = ProtobufConverter()
    with FederatedLearningClient(host="127.0.0.1", port=port,
                                 client_id="legacy") as c:
        c.register(CAPS)
        gm = c.get_global_model()
        rnd = gm.round_number
    # build the raw proto exactly like a reference client would
    buf = io.BytesIO()
    torch.save({k: torch.from_numpy(np.asarray(v).copy())
                for k, v in gm.model_weights.items()}, buf)
    hex_payload = buf.getvalue().hex().encode()
    msg = pb.ModelUpdate(client_id="legacy", round_number=rnd,
                         model_weights=hex_payload, num_samples=50,
                         training_loss=1.2, timestamp=int(time.time()))
    decoded = conv.model_update_from_proto(msg)
    assert set(decoded.model_weights) == set(gm.model_weights)


def test_coordinator_persists_and_resumes(tmp_path):
    """VERDICT #10: every aggregated global model is persisted (npz weights +
    sqlite row), and a restarted coordinator resumes serving at the round
    after the newest persisted model, with bit-exact weights."""
    from fl_tpu.services.persistence import CoordinatorPersistence

    store = CoordinatorPersistence(str(tmp_path / "models"))
    servicer = FederatedLearningServicer(
        round_config=RoundConfig(min_clients=2, local_epochs=1),
        persistence=store,
    )
    srv = CoordinatorGRPCServer(servicer, host="127.0.0.1", port=0)
    port = srv.start()
    try:
        c1 = make_client(port, "pr_a")
        c2 = make_client(port, "pr_b")
        try:
            c1.register(CAPS)
            c2.register(CAPS)
            gm = c1.get_global_model()
            rnd = gm.round_number
            w = {k: np.asarray(v) for k, v in gm.model_weights.items()}
            for c, cid, eps in ((c1, "pr_a", 0.01), (c2, "pr_b", 0.02)):
                ack = c.submit_model_update(ModelUpdate(
                    client_id=cid, round_number=rnd,
                    model_weights={k: v + eps for k, v in w.items()},
                    num_samples=100, training_loss=0.5))
                assert ack["success"]
            deadline = time.time() + 30
            while time.time() < deadline:
                if servicer.current_round == rnd + 1:
                    break
                time.sleep(0.2)
            else:
                pytest.fail("aggregation did not advance the round")
        finally:
            c1.close()
            c2.close()
    finally:
        srv.stop()
    aggregated = servicer.global_model

    # "restart": a brand-new servicer over the same store
    store2 = CoordinatorPersistence(str(tmp_path / "models"))
    resumed = FederatedLearningServicer(
        round_config=RoundConfig(min_clients=2, local_epochs=1),
        persistence=store2,
    )
    assert resumed.current_round == rnd + 1
    assert resumed.global_model is not None
    for k in aggregated.model_weights:
        np.testing.assert_array_equal(
            np.asarray(resumed.global_model.model_weights[k]),
            np.asarray(aggregated.model_weights[k]))
    # DB rows exist for the round and the model
    row = store2.repository.get_round(rnd)
    assert row is not None and row["status"] == "completed"


def test_tls_loopback_round_trip(tmp_path):
    """TLS-enabled coordinator <-> TLS client over localhost with a
    self-signed cert (the reference serves insecure channels only); an
    insecure client against the TLS server must fail to connect."""
    import datetime

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "localhost")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name).issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=1))
        .add_extension(
            x509.SubjectAlternativeName([x509.DNSName("localhost")]),
            critical=False)
        .sign(key, hashes.SHA256())
    )
    cert_path = tmp_path / "server.crt"
    key_path = tmp_path / "server.key"
    cert_path.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_path.write_bytes(key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.TraditionalOpenSSL,
        serialization.NoEncryption()))

    servicer = FederatedLearningServicer(
        round_config=RoundConfig(min_clients=1, local_epochs=1))
    srv = CoordinatorGRPCServer(servicer, host="localhost", port=0,
                                tls_cert_path=str(cert_path),
                                tls_key_path=str(key_path))
    port = srv.start()
    try:
        with FederatedLearningClient(
            host="localhost", port=port, client_id="tls_c",
            tls_root_cert_path=str(cert_path), timeout_s=10.0,
        ) as c:
            info = c.register(CAPS)
            assert info["client_id"] == "tls_c"
            assert c.health_check()

        # plaintext client against the TLS port: the RPC must fail
        with pytest.raises(GRPCClientError):
            with FederatedLearningClient(host="localhost", port=port,
                                         client_id="plain",
                                         max_retries=1,
                                         timeout_s=3.0) as bad:
                bad.register(CAPS)
    finally:
        srv.stop()
