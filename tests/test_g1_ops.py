"""Batched G1 ops vs the reference implementation (bit-exact through affine)."""

import random

import numpy as np
import pytest

from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import g1 as ref
from snarkos_tpu.ops import g1 as ops

pytestmark = pytest.mark.slow  # device-op tier: XLA:CPU compile-heavy (README two-tier run)

RNG = random.Random(99)


def _rand_points(n):
    """Random curve points (plus identity lanes) as reference tuples."""
    pts = [ref.INFINITY, ref.GENERATOR]
    while len(pts) < n:
        k = RNG.randrange(1, params.FR_MODULUS)
        pts.append(ref.scalar_mul(k, ref.GENERATOR))
    return pts[:n]


def _affine_all(pts):
    return [ref.affine(p) for p in pts]


@pytest.fixture(scope="module")
def point_batch():
    return _rand_points(8)


class TestG1Ops:
    def test_roundtrip(self, point_batch):
        enc = ops.encode_points(point_batch)
        dec = ops.decode_points(enc)
        assert _affine_all(dec) == _affine_all(point_batch)

    def test_double(self, point_batch):
        enc = ops.encode_points(point_batch)
        out = ops.decode_points(ops.double(enc))
        expect = [ref.double(p) for p in point_batch]
        assert _affine_all(out) == _affine_all(expect)

    def test_add_generic_and_special(self, point_batch):
        a = point_batch
        # force every special case: P+Q, P+P (double), P+(-P), inf+Q, P+inf
        b = [a[1], a[1], ref.neg(a[2]), a[3], ref.INFINITY, a[5], a[6], a[7]]
        b[1] = a[1]  # lane 1: doubling
        b2 = list(b)
        b2[2] = ref.neg(a[2])
        ea, eb = ops.encode_points(a), ops.encode_points(b2)
        out = ops.decode_points(ops.add(ea, eb))
        expect = [ref.add(p, q) for p, q in zip(a, b2)]
        assert _affine_all(out) == _affine_all(expect)

    def test_scalar_mul(self, point_batch):
        enc = ops.encode_points(point_batch)
        for e in [0, 5, params.FR_MODULUS - 1]:
            out = ops.decode_points(ops.scalar_mul(enc, e))
            expect = [ref.scalar_mul(e, p) for p in point_batch]
            assert _affine_all(out) == _affine_all(expect), f"e={e}"

    def test_madd_mixed(self, point_batch):
        """Complete mixed add (Jacobian + affine) vs the reference, covering
        generic / doubling / negation / identity-left lanes (the MSM
        bucket-scan hot combine, ops/msm_pallas.py)."""
        import jax.numpy as jnp

        from snarkos_tpu.ops import g1 as g1ops

        a = point_batch  # left operands (Jacobian; includes INFINITY lane 0)
        # right operands MUST be non-identity affine points
        b = [a[1], a[1], ref.neg(a[2]), a[3], a[4] or ref.GENERATOR,
             a[5], a[6], a[7]]
        b = [p if p is not None else ref.GENERATOR for p in b]
        b[1] = a[1]   # lane 1: P + P (doubling branch)
        b[2] = ref.neg(a[2])  # lane 2: P + (-P) = infinity
        # normalize right operands to z == 1 (madd takes AFFINE coords)
        b = [(ax, ay, 1) for ax, ay in (ref.affine(p) for p in b)]
        ea = ops.encode_points(a)
        eb = ops.encode_points(b)
        from snarkos_tpu.ops.fieldspec import FQ
        from snarkos_tpu.ops import modarith as fa

        # normalize right operands to affine coords (z==1 by construction)
        one = fa.broadcast_const(FQ, 1, eb.z.shape[1:])
        assert bool(jnp.all(eb.z == one)), "test operands must be affine"
        out = ops.decode_points(g1ops.madd(ea, eb.x, eb.y))
        expect = [ref.add(p, q) for p, q in zip(a, b)]
        assert _affine_all(out) == _affine_all(expect)

    def test_to_affine(self, point_batch):
        enc = ops.encode_points(point_batch)
        x, y, inf = ops.to_affine(enc)
        from snarkos_tpu.ops.fieldspec import FQ

        xs = FQ.decode(np.asarray(x))
        ys = FQ.decode(np.asarray(y))
        infs = list(np.asarray(inf))
        for i, p in enumerate(point_batch):
            a = ref.affine(p)
            if a is None:
                assert infs[i]
            else:
                assert not infs[i]
                assert (xs[i], ys[i]) == a
