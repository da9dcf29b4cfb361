"""TPU NTT kernel vs the Python reference (bit-exact)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import ntt as ref
from snarkos_tpu.ops import ntt as ops
from snarkos_tpu.ops.fieldspec import FR

pytestmark = pytest.mark.slow  # device-op tier: XLA:CPU compile-heavy (README two-tier run)

RNG = random.Random(17)


@pytest.mark.parametrize("n", [2, 16, 128])
def test_forward_matches_reference(n):
    vals = [RNG.randrange(params.FR_MODULUS) for _ in range(n)]
    a = jnp.array(FR.encode(vals))
    got = FR.decode(np.asarray(ops.ntt(a)))
    assert got == ref.ntt(vals)


@pytest.mark.parametrize("n", [16, 128])
def test_roundtrip(n):
    vals = [RNG.randrange(params.FR_MODULUS) for _ in range(n)]
    a = jnp.array(FR.encode(vals))
    back = FR.decode(np.asarray(ops.intt(ops.ntt(a))))
    assert back == vals


def test_inverse_matches_reference():
    n = 64
    vals = [RNG.randrange(params.FR_MODULUS) for _ in range(n)]
    a = jnp.array(FR.encode(vals))
    got = FR.decode(np.asarray(ops.intt(a)))
    assert got == ref.intt(vals)


def test_batched():
    n, b = 32, 4
    rows = [[RNG.randrange(params.FR_MODULUS) for _ in range(n)] for _ in range(b)]
    flat = [v for row in rows for v in row]
    a = jnp.array(FR.encode(flat)).reshape(FR.nlimbs, b, n)
    out = np.asarray(ops.ntt_batched(a))
    for i, row in enumerate(rows):
        got = FR.decode(out[:, i, :])
        assert got == ref.ntt(row)


def test_edge_values():
    n = 16
    p = params.FR_MODULUS
    vals = [0, 1, p - 1, p - 2] + [0] * (n - 4)
    a = jnp.array(FR.encode(vals))
    assert FR.decode(np.asarray(ops.ntt(a))) == ref.ntt(vals)
