"""Batched Poseidon kernel vs the Python reference (bit-exact)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import poseidon as ref
from snarkos_tpu.ops import poseidon as ops
from snarkos_tpu.ops.fieldspec import FR

pytestmark = pytest.mark.slow  # device-op tier: XLA:CPU compile-heavy (README two-tier run)

RNG = random.Random(5)


def _encode_inputs(batches):
    """list of equal-length input lists -> (n, L, B) Montgomery limbs."""
    n = len(batches[0])
    cols = [[row[k] for row in batches] for k in range(n)]
    return jnp.stack([jnp.array(FR.encode(c)) for c in cols], axis=0)


def test_permute_matches_reference():
    rate = 2
    states = [[RNG.randrange(params.FR_MODULUS) for _ in range(rate + 1)] for _ in range(4)]
    enc = _encode_inputs(states)  # (t, L, B)
    out = ops.permute(enc, rate)
    for lane, st in enumerate(states):
        expect = ref.permute(st, rate)
        got = [FR.decode(np.asarray(out[i, :, lane : lane + 1]))[0] for i in range(rate + 1)]
        assert got == expect


def test_hash_rate2():
    inputs = [[RNG.randrange(params.FR_MODULUS) for _ in range(5)] for _ in range(8)]
    enc = _encode_inputs(inputs)
    out = ops.hash_fixed(enc, rate=2, domain="test")  # (1, L, B)
    got = FR.decode(np.asarray(out[0]))
    expect = [ref.hash1(row, rate=2, domain="test") for row in inputs]
    assert got == expect


def test_hash_rate4_multi_output():
    inputs = [[RNG.randrange(params.FR_MODULUS) for _ in range(4)] for _ in range(3)]
    enc = _encode_inputs(inputs)
    out = ops.hash_fixed(enc, rate=4, domain="d", num_outputs=3)
    for lane, row in enumerate(inputs):
        expect = ref.hash_many(row, rate=4, num_outputs=3, domain="d")
        got = [FR.decode(np.asarray(out[k, :, lane : lane + 1]))[0] for k in range(3)]
        assert got == expect


def test_hash_edge_values():
    p = params.FR_MODULUS
    inputs = [[0, 0], [p - 1, p - 1], [0, p - 1], [1, 0]]
    enc = _encode_inputs(inputs)
    got = FR.decode(np.asarray(ops.hash_fixed(enc, rate=2)[0]))
    expect = [ref.hash1(row, rate=2) for row in inputs]
    assert got == expect
