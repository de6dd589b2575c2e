"""Deployment services: wire serialization, proto converters, gRPC
coordinator/client, REST management API, YAML config, CLIs.

Parity targets: proto/federated_learning.proto + src/shared/grpc_utils.py,
serialization.py; src/coordinator/{grpc_server,rest_api,main}.py;
src/client/{grpc_client,federated_trainer,main}.py.
"""
