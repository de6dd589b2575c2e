#!/usr/bin/env python
"""Deployment helper: proto generation, environment checks, local compose.

Parity target: scripts/deploy.py — generate_grpc_files (:23, protoc
invocation), environment setup, and docker-compose local deployment.
"""

import argparse
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def generate_proto() -> int:
    """Regenerate the pb2 bindings (ref: generate_grpc_files,
    deploy.py:23-60). Only `protoc --python_out` is needed — the gRPC
    stubs are hand-rolled over grpc's generic API
    (fl_tpu/services/grpc_utils.py)."""
    protoc = shutil.which("protoc")
    if protoc is None:
        print("protoc not found", file=sys.stderr)
        return 1
    cmd = [protoc, f"--python_out={REPO / 'fl_tpu' / 'services'}",
           f"--proto_path={REPO / 'proto'}",
           str(REPO / "proto" / "federated_learning.proto")]
    print("$", " ".join(cmd))
    return subprocess.call(cmd)


def check_environment() -> int:
    """Verify runtime dependencies and accelerator availability."""
    problems = []
    for mod in ("jax", "flax", "optax", "numpy", "yaml"):
        try:
            __import__(mod)
        except ImportError:
            problems.append(f"missing python package: {mod}")
    for mod in ("grpc", "google.protobuf"):
        try:
            __import__(mod)
        except ImportError:
            problems.append(f"missing (services will be degraded): {mod}")
    try:
        import jax

        print(f"jax {jax.__version__}, devices: {jax.devices()}")
    except Exception as e:
        problems.append(f"jax backend failed: {e}")
    for p in problems:
        print("!", p)
    print("environment OK" if not problems else
          f"{len(problems)} problem(s) found")
    return 0 if not problems else 1


def deploy_local(num_clients: int) -> int:
    """Start a local docker-compose deployment (coordinator + N clients)."""
    compose = shutil.which("docker-compose") or shutil.which("docker")
    if compose is None:
        print("docker not available; run services directly:\n"
              "  fl-coordinator --config config/coordinator.yaml\n"
              "  fl-client --config config/client.yaml", file=sys.stderr)
        return 1
    cmd = ([compose, "compose"] if compose.endswith("docker")
           else [compose])
    cmd += ["-f", str(REPO / "docker-compose.yml"), "up", "-d",
            "--scale", f"client={num_clients}"]
    print("$", " ".join(cmd))
    return subprocess.call(cmd)


def main() -> int:
    p = argparse.ArgumentParser(description="fl_tpu deployment helper")
    p.add_argument("action", choices=["proto", "check", "local"],
                   help="proto: regen bindings; check: env check; "
                        "local: docker-compose up")
    p.add_argument("--clients", type=int, default=2)
    args = p.parse_args()
    if args.action == "proto":
        return generate_proto()
    if args.action == "check":
        return check_environment()
    return deploy_local(args.clients)


if __name__ == "__main__":
    raise SystemExit(main())
