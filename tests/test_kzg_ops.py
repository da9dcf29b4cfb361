"""Device-side KZG: parallel eval/quotient vs host synthetic division,
commit/open/batch-verify vs crypto/ref/kzg (reference semantics from
snarkVM's Varuna PC — SURVEY.md §2.10 transaction verify)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from snarkos_tpu.crypto import params
from snarkos_tpu.ops import kzg as kzg_ops
from snarkos_tpu.ops.fieldspec import FR

pytestmark = pytest.mark.slow  # device-op tier: XLA:CPU compile-heavy (README two-tier run)

R = params.FR_MODULUS
RNG = random.Random(77)


def _ref_eval_quotient(coeffs, z):
    y = 0
    for c in reversed(coeffs):
        y = (y * z + c) % R
    q = [0] * (len(coeffs) - 1)
    carry = 0
    for i in range(len(coeffs) - 1, 0, -1):
        carry = (coeffs[i] + carry * z) % R
        q[i - 1] = carry
    return y, q


@pytest.mark.parametrize("n", [8, 64])
def test_eval_and_quotient_matches_synthetic_division(n):
    coeffs = [RNG.randrange(R) for _ in range(n)]
    z = RNG.randrange(1, R)
    y_ref, q_ref = _ref_eval_quotient(coeffs, z)
    coeffs_mont = jnp.array(FR.encode_fast(coeffs, mont=True))
    y, q = kzg_ops.eval_and_quotient(coeffs_mont, z)
    assert y == y_ref
    got_q = FR.decode_fast(np.asarray(q), mont=True)
    assert got_q == q_ref + [0]  # zero-padded top coefficient


def test_eval_and_quotient_z_zero():
    n = 16
    coeffs = [RNG.randrange(R) for _ in range(n)]
    coeffs_mont = jnp.array(FR.encode_fast(coeffs, mont=True))
    y, q = kzg_ops.eval_and_quotient(coeffs_mont, 0)
    assert y == coeffs[0]
    assert FR.decode_fast(np.asarray(q), mont=True) == coeffs[1:] + [0]


@pytest.mark.slow
def test_commit_open_verify_vs_reference():
    from snarkos_tpu.crypto.ref import g1 as ref_g1, kzg as ref_kzg
    from snarkos_tpu.ops import g1 as g1ops

    n = 8
    srs = ref_kzg.SRS.setup(n)
    points = g1ops.encode_points(
        [ref_g1.from_affine(ref_g1.affine(p)) for p in srs.powers_g1[:n]]
    )
    coeffs = [RNG.randrange(R) for _ in range(n)]
    coeffs_mont = jnp.array(FR.encode_fast(coeffs, mont=True))

    c_dev = g1ops.decode_points(kzg_ops.commit(points, coeffs_mont, use_pallas=False))[0]
    c_ref = ref_kzg.commit(srs, coeffs)
    assert ref_g1.affine(c_dev) == ref_g1.affine(c_ref)

    z = RNG.randrange(1, R)
    y, w_dev_pt = kzg_ops.open_at(points, coeffs_mont, z, use_pallas=False)
    y_ref, w_ref = ref_kzg.open_at(srs, coeffs, z)
    assert y == y_ref
    w_dev = g1ops.decode_points(w_dev_pt)[0]
    assert ref_g1.affine(w_dev) == ref_g1.affine(w_ref)
    assert kzg_ops.verify(srs, c_dev, z, y, w_dev)
    assert not kzg_ops.verify(srs, c_dev, z, (y + 1) % R, w_dev)


@pytest.mark.slow
def test_batch_verify_two_pairings():
    from snarkos_tpu.crypto.ref import kzg as ref_kzg

    n = 8
    srs = ref_kzg.SRS.setup(n)
    openings = []
    for _ in range(3):
        coeffs = [RNG.randrange(R) for _ in range(n)]
        z = RNG.randrange(1, R)
        c = ref_kzg.commit(srs, coeffs)
        y, w = ref_kzg.open_at(srs, coeffs, z)
        openings.append((c, z, y, w))
    assert kzg_ops.batch_verify(srs, openings, use_pallas=False)
    assert ref_kzg.batch_verify(srs, openings)
    bad = list(openings)
    c, z, y, w = bad[1]
    bad[1] = (c, z, (y + 1) % R, w)
    assert not kzg_ops.batch_verify(srs, bad, use_pallas=False)
    assert kzg_ops.batch_verify(srs, [], use_pallas=False)
