"""Fast-tier smoke coverage of the device-op layer.

The full bit-exactness suites (test_modarith/test_g1_ops/...) are marked
``slow`` because XLA:CPU compiles the limb kernels pathologically slowly;
this module keeps one tiny compile per op family in the default tier so a
broken ops layer is caught by ``pytest -m "not slow"`` (reference CI shape:
per-crate test jobs, .circleci/config.yml:173-343).
"""

import random

import numpy as np
import jax.numpy as jnp

from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import g1 as ref_g1
from snarkos_tpu.ops import g1 as g1_ops
from snarkos_tpu.ops import modarith as fa
from snarkos_tpu.ops.fieldspec import FQ, FR

RNG = random.Random(99)


def test_mont_mul_smoke():
    vals_a = [RNG.randrange(params.FQ_MODULUS) for _ in range(4)]
    vals_b = [RNG.randrange(params.FQ_MODULUS) for _ in range(4)]
    a = jnp.array(FQ.encode(vals_a, mont=True))
    b = jnp.array(FQ.encode(vals_b, mont=True))
    out = FQ.decode(np.asarray(fa.mont_mul(FQ, a, b)), mont=True)
    assert out == [x * y % params.FQ_MODULUS for x, y in zip(vals_a, vals_b)]


def test_g1_add_smoke():
    p = g1_ops.encode_points([ref_g1.GENERATOR])
    q = g1_ops.encode_points([ref_g1.double(ref_g1.GENERATOR)])
    out = g1_ops.decode_points(g1_ops.add(p, q))[0]
    expect = ref_g1.add(ref_g1.GENERATOR, ref_g1.double(ref_g1.GENERATOR))
    assert ref_g1.affine(out) == ref_g1.affine(expect)


def test_fr_roundtrip_smoke():
    vals = [0, 1, params.FR_MODULUS - 1, RNG.randrange(params.FR_MODULUS)]
    enc = jnp.array(FR.encode(vals))
    assert FR.decode(np.asarray(enc)) == vals
