"""DP noise keys must not be derivable from public identifiers.

ADVICE r4 (high): the client root key was sha256(client_id) — public — and
every DP noise draw descended from it, so anyone knowing (client_id,
client_index, round) could regenerate the exact noise and subtract it from
the upload, voiding (eps, delta). Round 5 splits the derivation: shuffle /
training streams stay deterministic from client_id (resume reproducibility),
while DP_NOISE / DISTRIBUTED_DP descend from a secret-keyed HMAC digest.
"""

import os
import stat

import jax
import numpy as np
import pytest

from fl_tpu.core import prng
from fl_tpu.services.federated_trainer import FederatedTrainer


def _mk(client_id="c0", **kw):
    # construction only — no network, no initialize()
    return FederatedTrainer(client_id=client_id, **kw)


def test_dp_root_key_not_derivable_from_client_id():
    """Two trainers with the same public identity but default (random)
    secrets must have different DP roots — and neither equals the
    sha256(client_id)-derived public root."""
    a, b = _mk(), _mk()
    assert not np.array_equal(np.asarray(a._dp_root_key),
                              np.asarray(b._dp_root_key))
    assert not np.array_equal(np.asarray(a._dp_root_key),
                              np.asarray(a._root_key))


def test_shuffle_root_key_still_deterministic():
    """Non-privacy streams keep resume reproducibility."""
    a, b = _mk(), _mk()
    assert np.array_equal(np.asarray(a._root_key), np.asarray(b._root_key))
    # and differs across client ids
    c = _mk("c1")
    assert not np.array_equal(np.asarray(a._root_key),
                              np.asarray(c._root_key))


def test_injected_secret_reproduces_noise_stream():
    """The explicit test/resume hook: same secret -> same DP root; different
    secret -> different root."""
    s1, s2 = os.urandom(32), os.urandom(32)
    a = _mk(dp_noise_secret=s1)
    b = _mk(dp_noise_secret=s1)
    c = _mk(dp_noise_secret=s2)
    assert np.array_equal(np.asarray(a._dp_root_key),
                          np.asarray(b._dp_root_key))
    assert not np.array_equal(np.asarray(a._dp_root_key),
                              np.asarray(c._dp_root_key))


def test_dp_secret_path_persists_0600(tmp_path):
    p = tmp_path / "state" / "dp.secret"
    a = _mk(dp_secret_path=str(p))
    assert p.exists()
    mode = stat.S_IMODE(p.stat().st_mode)
    assert mode == 0o600
    # resume: a second trainer reading the same file reproduces the root
    b = _mk(dp_secret_path=str(p))
    assert np.array_equal(np.asarray(a._dp_root_key),
                          np.asarray(b._dp_root_key))


def test_dp_secret_path_rejects_weak_file(tmp_path):
    p = tmp_path / "weak.secret"
    p.write_bytes(b"short")
    with pytest.raises(ValueError, match="entropy"):
        _mk(dp_secret_path=str(p))


def test_root_key_from_digest_uses_more_than_31_bits():
    """ADVICE r4 (low): keys that agree on the first 4 digest bytes must
    still differ — the fold absorbs 4x31 bits, not digest[:4]."""
    base = bytes(range(16))
    tail_flip = base[:4] + bytes([b ^ 0xFF for b in base[4:]])
    k1 = prng.root_key_from_digest(base)
    k2 = prng.root_key_from_digest(tail_flip)
    assert not np.array_equal(np.asarray(k1), np.asarray(k2))
    with pytest.raises(ValueError):
        prng.root_key_from_digest(b"tooshort")


def test_noise_draw_differs_across_secrets():
    """End check at the draw site granularity: the DP_NOISE stream key for
    the same (round, client_index) differs under different secrets."""
    a = _mk(dp_noise_secret=b"A" * 32)
    b = _mk(dp_noise_secret=b"B" * 32)

    def nkey(tr):
        dpkey = prng.client_key(prng.round_key(tr._dp_root_key, 3), 0)
        return prng.stream_key(dpkey, prng.Stream.DP_NOISE)

    na, nb = nkey(a), nkey(b)
    assert not np.array_equal(np.asarray(na), np.asarray(nb))
    za = jax.random.normal(na, (8,))
    zb = jax.random.normal(nb, (8,))
    assert not np.allclose(np.asarray(za), np.asarray(zb))
