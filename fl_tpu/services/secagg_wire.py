"""Deployment-grade secure aggregation over the gRPC wire.

The on-chip simulation's secure aggregation (fl_tpu.fl.secure_agg) draws
pair masks from a shared PRNG the harness controls. In deployment the
coordinator must never learn the masks, so clients derive them by
**Diffie-Hellman key agreement**:

1. each client generates an X25519 keypair and advertises the public key
   at registration (``ClientRegistration.metadata["secagg_pubkey"]``, hex);
2. the coordinator freezes a **roster** per round once ``min_clients``
   keys are present and serves it via the ``GetSecAggRoster`` RPC
   (an fl_tpu service extension — adding RPCs is wire-compatible);
3. every pair (i, j) of roster members computes the same shared secret
   ``X25519(sk_i, pk_j)``, expands it with SHA-256 over the round number,
   and seeds a PRG for a mask vector over the flat weight dimension; the
   lexicographically-smaller client id adds the mask, the larger subtracts;
4. client i uploads ``n_i·θ_i + Σ_j ±m_ij`` (sample-count-prescaled, the
   SecAgg-standard trick so the weighted mean survives masking) with
   ``num_samples = n_i``; the coordinator sums payloads — masks cancel —
   and divides by Σ n_i. It never sees an individual model.

**Dropout semantics: all-or-retry.** Aggregation fires only when every
roster member has submitted; if one dies mid-round the round stalls until
the round timeout clears it (the Bonawitz §4 Shamir seed-recovery protocol
is out of scope — documented limitation). Masked payloads cannot be
content-validated (that is the point), so magnitude validation is skipped
for them; DP composes by noising BEFORE masking on the client.

**Mask scale.** Gaussian masks hide the payload only when their scale
dominates it: choose ``scale >> n_max · max|θ|`` (the default 1000 covers
typical CNN weights at hundreds of samples; Bonawitz's integer masks mod p
are perfectly hiding — the float analog trades that for simplicity and
costs ~scale·2⁻²⁴ absolute f32 rounding per coordinate in the recovered
sum, negligible against the Σn divisor at scale 1e3).
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Sequence, Tuple

import numpy as np

from fl_tpu.core.types import GlobalModel, ModelUpdate

PUBKEY_METADATA_KEY = "secagg_pubkey"


def generate_keypair():
    """X25519 keypair; returns (private_key_object, public_bytes(32))."""
    from cryptography.hazmat.primitives.asymmetric.x25519 import (
        X25519PrivateKey,
    )
    from cryptography.hazmat.primitives import serialization

    sk = X25519PrivateKey.generate()
    pk = sk.public_key().public_bytes(
        serialization.Encoding.Raw, serialization.PublicFormat.Raw
    )
    return sk, pk


def _pair_seed(sk, peer_pub: bytes, round_number: int) -> int:
    """Shared 64-bit PRG seed for one (pair, round): HKDF-style SHA-256 of
    the DH shared secret and the round number. Both endpoints derive the
    same value."""
    from cryptography.hazmat.primitives.asymmetric.x25519 import (
        X25519PublicKey,
    )

    shared = sk.exchange(X25519PublicKey.from_public_bytes(peer_pub))
    digest = hashlib.sha256(
        b"fl_tpu-secagg|" + shared + b"|" + str(round_number).encode()
    ).digest()
    return int.from_bytes(digest[:8], "big")


def _flat_order(weights: Dict[str, np.ndarray]) -> List[str]:
    return sorted(weights.keys())


def mask_vector(
    sk,
    my_id: str,
    peers: Sequence[Tuple[str, bytes]],
    round_number: int,
    dim: int,
    scale: float = 1000.0,
) -> np.ndarray:
    """Σ_j ±PRG(seed_ij) over the flat weight dimension. Antisymmetric per
    pair: the lexicographically smaller client id adds, the larger
    subtracts — so the roster-wide sum cancels exactly."""
    total = np.zeros(dim, np.float64)
    for peer_id, peer_pub in peers:
        if peer_id == my_id:
            continue
        seed = _pair_seed(sk, peer_pub, round_number)
        noise = np.random.default_rng(seed).standard_normal(dim) * scale
        total += noise if my_id < peer_id else -noise
    return total.astype(np.float32)


def mask_weights(
    weights: Dict[str, np.ndarray],
    num_samples: int,
    sk,
    my_id: str,
    peers: Sequence[Tuple[str, bytes]],
    round_number: int,
    scale: float = 1000.0,
) -> Dict[str, np.ndarray]:
    """The client-side transform: n·θ + pairwise masks, layer by layer in
    sorted-key order (both sides use the same flattening)."""
    keys = _flat_order(weights)
    dim = int(sum(np.asarray(weights[k]).size for k in keys))
    mask = mask_vector(sk, my_id, peers, round_number, dim, scale)
    out: Dict[str, np.ndarray] = {}
    offset = 0
    for k in keys:
        w = np.asarray(weights[k], np.float32)
        out[k] = (num_samples * w
                  + mask[offset: offset + w.size].reshape(w.shape))
        offset += w.size
    return out


def unmask_aggregate(updates: Sequence[ModelUpdate]) -> GlobalModel:
    """Coordinator side: Σ payloads / Σ n — the masks cancel in the sum.

    Requires the COMPLETE roster's updates (all-or-retry); the caller
    enforces that."""
    if not updates:
        raise ValueError("no updates to aggregate")
    total_n = float(sum(u.num_samples for u in updates))
    keys = _flat_order(updates[0].model_weights)
    summed = {
        k: np.sum([np.asarray(u.model_weights[k], np.float64)
                   for u in updates], axis=0)
        for k in keys
    }
    averaged = {k: (v / total_n).astype(np.float32)
                for k, v in summed.items()}
    acc_metrics = {}
    reported = [(u.training_metrics.accuracy, u.num_samples)
                for u in updates if u.training_metrics is not None]
    if reported:
        acc_metrics["train_accuracy"] = float(
            sum(a * n for a, n in reported) / sum(n for _, n in reported)
        )
    return GlobalModel(
        round_number=updates[0].round_number,
        model_weights=averaged,
        accuracy_metrics=acc_metrics,
        participating_clients=[u.client_id for u in updates],
        convergence_score=0.0,
    )
