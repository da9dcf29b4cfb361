"""Golden known-answer vectors (tests/fixtures/golden.json).

Provenance (BASELINE "bit-exact" evidence policy):

- EXTERNALLY ANCHORED: the BLS12-377 moduli/generators are verified
  computationally from the BLS family polynomial (tests/test_params.py),
  the G1/G2 vectors are forced by the curve equations + subgroup order
  (r*G = infinity is asserted at generation), and the pairing vectors are
  forced by bilinearity (e(aP, bQ) = e(P,Q)^{ab} asserted at generation).
  Any implementation of BLS12-377 must reproduce these bytes.
- FRAMEWORK-OWNED (intentional divergence from snarkVM, documented):
  Poseidon uses this framework's Grain-LFSR instance (alpha=17, 8 full +
  31 partial rounds — snarkVM's structure, but our own domain tags and
  therefore different round constants per domain), BHP bases and Edwards
  signature domain tags are likewise this framework's own. Vectors for
  these pin the implementation against regression; snarkVM byte-equality
  is NOT claimed (no snarkVM source or vectors exist in this environment
  — /root/reference vendors snarkOS only).

Both the host reference layer AND the device kernels are asserted against
the same vectors, so the two independent implementations cannot drift.
"""

import json
import os

import pytest

from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import bhp, edwards, g1, ntt, pairing, poseidon

FIX = json.load(open(os.path.join(os.path.dirname(__file__), "fixtures", "golden.json")))


def _f12_flat(v):
    def rec(x):
        if isinstance(x, (tuple, list)):
            for y in x:
                yield from rec(y)
        else:
            yield x
    return [str(c) for c in rec(v)]


# ---------------------------------------------------------------- reference
def test_g1_multiples_ref():
    for row in FIX["g1_multiples"]:
        p = g1.affine(g1.scalar_mul(int(row["k"]), g1.GENERATOR))
        assert (str(p[0]), str(p[1])) == (row["x"], row["y"]), row["k"]
    assert g1.affine(g1.scalar_mul(params.FR_MODULUS, g1.GENERATOR)) is None


def test_g2_multiples_ref():
    for row in FIX["g2_multiples"]:
        q = pairing.g2_scalar_mul(int(row["k"]), pairing.G2_GENERATOR)
        assert [str(c) for c in q[0]] == row["x"]
        assert [str(c) for c in q[1]] == row["y"]


def test_pairing_vectors_ref():
    e = pairing.pairing(g1.affine(g1.GENERATOR), pairing.G2_GENERATOR)
    assert _f12_flat(e) == FIX["pairing_e_g1_g2"]
    row = FIX["pairing_bilinear_ab"]
    a, b = row["a"], row["b"]
    lhs = pairing.pairing(
        g1.affine(g1.scalar_mul(a, g1.GENERATOR)),
        pairing.g2_scalar_mul(b, pairing.G2_GENERATOR),
    )
    assert _f12_flat(lhs) == row["value"]
    # bilinearity re-asserted at test time (external mathematical anchor)
    assert _f12_flat(pairing.f12_pow(e, a * b)) == row["value"]


def test_ntt_vector_ref():
    row = FIX["ntt_16"]
    got = ntt.ntt([int(v) for v in row["input"]])
    assert [str(v) for v in got] == row["output"]


def test_poseidon_vectors_ref():
    assert str(poseidon.hash1([1, 2, 3], rate=2)) == FIX["poseidon"]["rate2_hash1_123"]
    assert str(poseidon.hash1([42], rate=2, domain="snarkos_tpu.test")) == \
        FIX["poseidon"]["rate2_domain"]
    assert str(poseidon.hash_many([9, 8, 7, 6, 5], rate=4, num_outputs=2)[1]) == \
        FIX["poseidon"]["rate4_hash1"]


def test_bhp_vectors_ref():
    assert bhp.bhp256(b"hello").hex() == FIX["bhp256"]["hello"]
    assert bhp.bhp256(bytes(64)).hex() == FIX["bhp256"]["empty64"]


def test_edwards_vector_ref():
    row = FIX["edwards"]
    acct = edwards.Account.new(seed=b"\x07" * 32)
    assert str(acct.sk) == row["sk"]
    sig = edwards.sign_bytes(acct.sk, acct.pk, row["msg"].encode(),
                             nonce=int(row["nonce"]))
    assert _f12_flat(sig) == row["sig"]
    assert edwards.verify_bytes(acct.pk, row["msg"].encode(), sig)


# ------------------------------------------------------------ device kernels
@pytest.mark.slow
def test_g1_multiples_device():
    """Device scalar_mul reproduces the golden G1 vectors bit-exactly."""
    from snarkos_tpu.ops import g1 as g1ops

    rows = FIX["g1_multiples"][:4]
    enc = g1ops.encode_points([g1.GENERATOR] * len(rows))
    for i, row in enumerate(rows):
        out = g1ops.decode_points(g1ops.scalar_mul(enc, int(row["k"])))
        p = g1.affine(out[i])
        assert (str(p[0]), str(p[1])) == (row["x"], row["y"]), row["k"]


@pytest.mark.slow
def test_ntt_vector_device():
    import jax.numpy as jnp
    import numpy as np

    from snarkos_tpu.ops import ntt as ntt_ops
    from snarkos_tpu.ops.fieldspec import FR

    row = FIX["ntt_16"]
    a = jnp.array(FR.encode([int(v) for v in row["input"]]))
    out = ntt_ops.ntt(a)
    got = [v * FR.mont_rinv % FR.p for v in FR.decode_fast(np.asarray(out))]
    assert [str(v) for v in got] == row["output"]


@pytest.mark.slow
def test_poseidon_vector_device():
    import jax.numpy as jnp
    import numpy as np

    from snarkos_tpu.ops import poseidon as poseidon_ops
    from snarkos_tpu.ops.fieldspec import FR

    inputs = jnp.stack([jnp.array(FR.encode([1])), jnp.array(FR.encode([2])),
                        jnp.array(FR.encode([3]))], axis=0)
    out = poseidon_ops.hash_fixed(inputs, rate=2)
    got = FR.decode_fast(np.asarray(out[0]))[0] * FR.mont_rinv % FR.p
    assert str(got) == FIX["poseidon"]["rate2_hash1_123"]
