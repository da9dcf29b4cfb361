"""Bit-exactness of the limb-decomposed JAX field ops vs the Python reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from snarkos_tpu.crypto import params
from snarkos_tpu.ops import fieldspec, modarith

pytestmark = pytest.mark.slow  # device-op tier: XLA:CPU compile-heavy (README two-tier run)

RNG = np.random.default_rng(7)


def _vectors(spec, n=64):
    """Random vectors plus forced edge cases: 0, 1, p-1, p-2, 2^k-1."""
    import random

    r = random.Random(123)
    vals = [0, 1, spec.p - 1, spec.p - 2, (1 << 64) - 1, (1 << (16 * spec.nlimbs - 8)) % spec.p]
    vals += [r.randrange(spec.p) for _ in range(n - len(vals))]
    return vals


@pytest.mark.parametrize("spec", [fieldspec.FQ, fieldspec.FR], ids=["fq", "fr"])
class TestModArith:
    def test_encode_decode_roundtrip(self, spec):
        vals = _vectors(spec)
        arr = spec.encode(vals)
        assert arr.dtype == np.int32
        assert spec.decode(arr) == vals

    def test_add_sub_neg(self, spec):
        vals_a, vals_b = _vectors(spec), _vectors(spec)[::-1]
        a, b = jnp.array(spec.encode(vals_a)), jnp.array(spec.encode(vals_b))
        got_add = spec.decode(np.array(modarith.add(spec, a, b)))
        got_sub = spec.decode(np.array(modarith.sub(spec, a, b)))
        got_neg = spec.decode(np.array(modarith.neg(spec, a)))
        assert got_add == [(x + y) % spec.p for x, y in zip(vals_a, vals_b)]
        assert got_sub == [(x - y) % spec.p for x, y in zip(vals_a, vals_b)]
        assert got_neg == [(-x) % spec.p for x in vals_a]

    def test_mont_mul(self, spec):
        vals_a, vals_b = _vectors(spec), _vectors(spec)[::-1]
        a, b = jnp.array(spec.encode(vals_a)), jnp.array(spec.encode(vals_b))
        got = spec.decode(np.array(modarith.mont_mul(spec, a, b)))
        assert got == [x * y % spec.p for x, y in zip(vals_a, vals_b)]

    def test_mont_mul_unrolled_karatsuba(self, spec):
        """The Pallas-kernel multiply (unrolled, one-level Karatsuba) must
        be bit-identical to the reference product, including the
        broadcast (L,1) x (L,B) form the kernels use for constants."""
        import jax

        vals_a, vals_b = _vectors(spec), _vectors(spec)[::-1]
        a, b = jnp.array(spec.encode(vals_a)), jnp.array(spec.encode(vals_b))
        assert modarith.KARATSUBA  # the shipped configuration
        got = spec.decode(np.array(
            jax.jit(modarith._mont_mul_unrolled, static_argnums=0)(spec, a, b)))
        assert got == [x * y % spec.p for x, y in zip(vals_a, vals_b)]
        one = jnp.array(spec.encode([vals_a[3]]))  # (L, 1) broadcast operand
        got2 = spec.decode(np.array(
            jax.jit(modarith._mont_mul_unrolled, static_argnums=0)(spec, one, b)))
        assert got2 == [vals_a[3] * y % spec.p for y in vals_b]

    def test_mul_small(self, spec):
        vals = _vectors(spec, 16)
        a = jnp.array(spec.encode(vals))
        for k in [0, 1, 2, 3, 4, 8]:
            got = spec.decode(np.array(modarith.mul_small(spec, a, k)))
            assert got == [x * k % spec.p for x in vals]

    def test_pow_and_inv(self, spec):
        vals = _vectors(spec, 8)
        a = jnp.array(spec.encode(vals))
        e = 0xDEADBEEF12345
        got_pow = spec.decode(np.array(modarith.mont_pow(spec, a, e)))
        assert got_pow == [pow(x, e, spec.p) for x in vals]
        got_inv = spec.decode(np.array(modarith.inv(spec, a)))
        expect = [pow(x, -1, spec.p) if x else 0 for x in vals]
        assert got_inv == expect

    def test_to_from_mont(self, spec):
        vals = _vectors(spec, 8)
        raw = jnp.array(spec.encode(vals, mont=False))
        m = modarith.to_mont(spec, raw)
        assert spec.decode(np.array(m), mont=True) == vals
        back = modarith.from_mont(spec, m)
        assert spec.decode(np.array(back), mont=False) == vals

    def test_eq_is_zero(self, spec):
        vals = [0, 1, 0, spec.p - 1]
        a = jnp.array(spec.encode(vals))
        assert list(np.array(modarith.is_zero(spec, a))) == [True, False, True, False]
        assert list(np.array(modarith.eq(spec, a, a))) == [True] * 4

    def test_random_sampler(self, spec):
        arr = spec.random(256, RNG)
        vals = spec.decode(arr, mont=False)
        assert all(0 <= v < spec.p for v in vals)
        assert len(set(vals)) > 250  # no obvious degeneracy

    def test_2d_batch(self, spec):
        vals = _vectors(spec, 12)
        a = jnp.array(spec.encode(vals)).reshape(spec.nlimbs, 3, 4)
        out = modarith.mont_mul(spec, a, a)
        flat = np.array(out).reshape(spec.nlimbs, 12)
        assert spec.decode(flat) == [x * x % spec.p for x in vals]
