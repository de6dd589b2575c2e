"""Unit tests for the Bonawitz secure-aggregation primitives
(fl_tpu.services.secagg_crypto)."""

import numpy as np
import pytest

from fl_tpu.services import secagg_crypto as sc


# ----------------------------------------------------------------- Shamir
def test_shamir_roundtrip_at_threshold():
    secret = bytes(range(32))
    shares = sc.shamir_split(secret, n=5, t=3)
    assert len(shares) == 5
    # any 3 of 5 reconstruct
    assert sc.shamir_reconstruct(shares[:3]) == secret
    assert sc.shamir_reconstruct([shares[0], shares[2], shares[4]]) == secret
    assert sc.shamir_reconstruct(shares) == secret  # all 5 too


def test_shamir_below_threshold_fails_loudly():
    secret = b"\x07" * 32
    shares = sc.shamir_split(secret, n=4, t=3)
    # 2 < t shares interpolate to a ~uniform field element, which the
    # 256-bit range check rejects with overwhelming probability
    with pytest.raises(ValueError):
        sc.shamir_reconstruct(shares[:2])


def test_shamir_duplicate_x_rejected():
    shares = sc.shamir_split(b"\x01" * 32, n=3, t=2)
    with pytest.raises(ValueError, match="duplicate"):
        sc.shamir_reconstruct([shares[0], shares[0]])


def test_shamir_t1_is_plain_replication():
    secret = b"\xAB" * 32
    shares = sc.shamir_split(secret, n=3, t=1)
    assert sc.shamir_reconstruct(shares[:1]) == secret


# ------------------------------------------------------------------- PRG
def test_mask_stream_deterministic_and_seed_sensitive():
    s1 = sc.mask_stream_u32(b"\x01" * 32, 1000)
    s2 = sc.mask_stream_u32(b"\x01" * 32, 1000)
    s3 = sc.mask_stream_u32(b"\x02" * 32, 1000)
    assert s1.dtype == np.uint32 and s1.shape == (1000,)
    np.testing.assert_array_equal(s1, s2)
    assert not np.array_equal(s1, s3)
    # roughly uniform over the 2^32 domain (very loose sanity bound)
    assert abs(float(s1.mean()) - 2**31) < 2**31 * 0.1


# ----------------------------------------------------------- fixed point
def test_fp_roundtrip_including_negatives():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1.0, 4096).astype(np.float32)
    enc = sc.fp_encode(x, frac_bits=16, headroom=4)
    dec = sc.fp_decode_sum(enc, frac_bits=16)
    np.testing.assert_allclose(dec, x, atol=2.0 ** -16)


def test_fp_sum_of_encodings_decodes_to_sum():
    rng = np.random.default_rng(1)
    xs = [rng.normal(0, 50.0, 512) for _ in range(4)]
    encs = [sc.fp_encode(x, headroom=4) for x in xs]
    total = encs[0]
    for e in encs[1:]:
        total = (total.astype(np.uint64) + e) % sc.MASK_DOMAIN
    dec = sc.fp_decode_sum(total.astype(np.uint32))
    np.testing.assert_allclose(dec, sum(xs), atol=4 * 2.0 ** -16)


def test_fp_encode_refuses_wraparound_risk():
    with pytest.raises(ValueError, match="overflow"):
        sc.fp_encode(np.array([40000.0]), frac_bits=16, headroom=1)
    with pytest.raises(ValueError, match="overflow"):
        # fits alone but not when summed with 100 peers
        sc.fp_encode(np.array([1000.0]), frac_bits=16, headroom=100)


# ----------------------------------------------------- pair-mask algebra
def test_signed_pair_masks_cancel_exactly_mod_2_32():
    ids = [f"c{i}" for i in range(4)]
    keys = {cid: sc.generate_keypair() for cid in ids}
    nonce, rn, dim = b"nonce123", 7, 2048
    total = np.zeros(dim, np.uint64)
    for cid in ids:
        acc = np.zeros(dim, np.uint64)
        for pid in ids:
            if pid == cid:
                continue
            seed = sc.pair_mask_seed(
                sc.dh_shared(keys[cid][0], keys[pid][1]), rn, nonce)
            m = sc.mask_stream_u32(seed, dim).astype(np.uint64)
            acc = (acc + (m if cid < pid else sc.MASK_DOMAIN - m)) \
                % sc.MASK_DOMAIN
        total = (total + acc) % sc.MASK_DOMAIN
    assert int(total.max()) == 0  # EXACT cancellation, no float residue


def test_mask_seed_binds_round_and_roster_nonce():
    (ska, pka), (skb, pkb) = sc.generate_keypair(), sc.generate_keypair()
    shared = sc.dh_shared(ska, pkb)
    assert shared == sc.dh_shared(skb, pka)  # DH agreement
    s1 = sc.pair_mask_seed(shared, 1, b"n1")
    assert s1 == sc.pair_mask_seed(shared, 1, b"n1")
    assert s1 != sc.pair_mask_seed(shared, 2, b"n1")   # round-bound
    assert s1 != sc.pair_mask_seed(shared, 1, b"n2")   # freeze-bound


# ------------------------------------------------------- share transport
def test_share_bundle_roundtrip_and_tamper_detection():
    key = sc._h(b"test-key", b"x")
    shares_k = sc.shamir_split(b"\x01" * 32, 3, 2)
    shares_b = sc.shamir_split(b"\x02" * 32, 3, 2)
    pt = sc.pack_share_pair(shares_k[0][0], shares_k[0][1], shares_b[0][1])
    blob = sc.encrypt_share_bundle(key, pt, aad=b"a->b|r1")
    x, yk, yb = sc.unpack_share_pair(
        sc.decrypt_share_bundle(key, blob, aad=b"a->b|r1"))
    assert (x, yk, yb) == (shares_k[0][0], shares_k[0][1], shares_b[0][1])
    with pytest.raises(Exception):  # wrong AAD -> authentication failure
        sc.decrypt_share_bundle(key, blob, aad=b"a->c|r1")
    with pytest.raises(Exception):  # flipped ciphertext bit
        tampered = blob[:-1] + bytes([blob[-1] ^ 1])
        sc.decrypt_share_bundle(key, tampered, aad=b"a->b|r1")


def test_private_key_raw_roundtrip():
    sk, pk = sc.generate_keypair()
    raw = sc.private_key_bytes(sk)
    sk2 = sc.private_key_from_bytes(raw)
    _, pk_other = sc.generate_keypair()
    assert sc.dh_shared(sk, pk_other) == sc.dh_shared(sk2, pk_other)
