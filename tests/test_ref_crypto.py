"""Tests for the pure-Python reference layer (the bit-exactness anchor)."""

import random

import pytest

from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import edwards, field, g1, kzg, ntt, pairing, poseidon

RNG = random.Random(42)


class TestField:
    def test_mont_roundtrip(self):
        for fp in (field.FQ, field.FR):
            for _ in range(20):
                a = RNG.randrange(fp.p)
                assert fp.from_mont(fp.to_mont(a)) == a

    def test_mont_mul(self):
        for fp in (field.FQ, field.FR):
            for _ in range(20):
                a, b = RNG.randrange(fp.p), RNG.randrange(fp.p)
                am, bm = fp.to_mont(a), fp.to_mont(b)
                assert fp.from_mont(fp.mont_mul(am, bm)) == a * b % fp.p

    def test_limbs_roundtrip(self):
        for fp in (field.FQ, field.FR):
            a = RNG.randrange(fp.p)
            assert fp.from_limbs(fp.to_limbs(a)) == a
            assert all(0 <= l < (1 << 16) for l in fp.to_limbs(a))

    def test_sqrt(self):
        fp = field.FR
        for _ in range(10):
            a = RNG.randrange(fp.p)
            s = fp.sqrt(a * a % fp.p)
            assert s is not None and s * s % fp.p == a * a % fp.p


class TestG1:
    def test_add_double_consistency(self):
        g = g1.GENERATOR
        assert g1.affine(g1.add(g, g)) == g1.affine(g1.double(g))
        assert g1.affine(g1.scalar_mul(5, g)) == g1.affine(
            g1.add(g1.double(g1.double(g)), g)
        )

    def test_identity(self):
        g = g1.GENERATOR
        assert g1.affine(g1.add(g, g1.INFINITY)) == g1.affine(g)
        assert g1.is_infinity(g1.add(g, g1.neg(g)))

    def test_msm_matches_sum(self):
        pts = [g1.scalar_mul(RNG.randrange(1, 100), g1.GENERATOR) for _ in range(8)]
        scalars = [RNG.randrange(params.FR_MODULUS) for _ in range(8)]
        expect = g1.INFINITY
        for s, p in zip(scalars, pts):
            expect = g1.add(expect, g1.scalar_mul(s, p))
        assert g1.affine(g1.msm(scalars, pts)) == g1.affine(expect)


class TestPoseidon:
    def test_deterministic(self):
        a = poseidon.hash1([1, 2, 3], rate=2)
        b = poseidon.hash1([1, 2, 3], rate=2)
        assert a == b and 0 < a < params.FR_MODULUS

    def test_input_sensitivity(self):
        assert poseidon.hash1([1, 2, 3], rate=2) != poseidon.hash1([1, 2, 4], rate=2)
        assert poseidon.hash1([1], rate=2) != poseidon.hash1([1], rate=4)
        assert poseidon.hash1([1], rate=2, domain="a") != poseidon.hash1([1], rate=2, domain="b")

    def test_params_shape(self):
        ark, mds = poseidon.poseidon_params(2)
        assert len(ark) == poseidon.FULL_ROUNDS + poseidon.PARTIAL_ROUNDS
        assert all(len(row) == 3 for row in ark)
        assert len(mds) == 3 and all(len(row) == 3 for row in mds)
        # MDS is Cauchy => invertible; quick sanity: no zero entries
        assert all(all(e != 0 for e in row) for row in mds)


class TestNTT:
    @pytest.mark.parametrize("n", [2, 8, 64, 256])
    def test_roundtrip(self, n):
        a = [RNG.randrange(params.FR_MODULUS) for _ in range(n)]
        assert ntt.intt(ntt.ntt(a)) == a

    def test_matches_dft(self):
        n = 8
        a = [RNG.randrange(params.FR_MODULUS) for _ in range(n)]
        omega = ntt.root_of_unity(n)
        r = params.FR_MODULUS
        expect = [
            sum(a[j] * pow(omega, j * k, r) for j in range(n)) % r for k in range(n)
        ]
        assert ntt.ntt(a) == expect

    def test_convolution_theorem(self):
        n = 16
        r = params.FR_MODULUS
        a = [RNG.randrange(r) for _ in range(n // 2)] + [0] * (n // 2)
        b = [RNG.randrange(r) for _ in range(n // 2)] + [0] * (n // 2)
        fa, fb = ntt.ntt(a), ntt.ntt(b)
        prod = ntt.intt([x * y % r for x, y in zip(fa, fb)])
        # schoolbook
        expect = [0] * n
        for i in range(n // 2):
            for j in range(n // 2):
                expect[i + j] = (expect[i + j] + a[i] * b[j]) % r
        assert prod == expect


class TestEdwardsSchnorr:
    def test_sign_verify(self):
        acct = edwards.Account.new(seed=b"\x01" * 32)
        msg = [5, 6, 7]
        sig = acct.sign(msg, nonce=12345)
        assert edwards.verify(acct.pk, msg, sig)
        assert not edwards.verify(acct.pk, [5, 6, 8], sig)
        other = edwards.Account.new(seed=b"\x02" * 32)
        assert not edwards.verify(other.pk, msg, sig)

    def test_sign_bytes(self):
        acct = edwards.Account.new(seed=b"\x03" * 32)
        sig = edwards.sign_bytes(acct.sk, acct.pk, b"hello world", nonce=99)
        assert edwards.verify_bytes(acct.pk, b"hello world", sig)
        assert not edwards.verify_bytes(acct.pk, b"hello worlx", sig)

    def test_compress_roundtrip(self):
        acct = edwards.Account.new(seed=b"\x04" * 32)
        assert edwards.decompress(edwards.compress(acct.pk)) == acct.pk


class TestPairing:
    def test_bilinearity(self):
        e1 = pairing.pairing(g1.GENERATOR, pairing.G2_GENERATOR)
        assert e1 != pairing.F12_ONE
        assert pairing.f12_pow(e1, params.FR_MODULUS) == pairing.F12_ONE
        a, b = 3, 5
        eab = pairing.pairing(
            g1.scalar_mul(a, g1.GENERATOR),
            pairing.g2_scalar_mul(b, pairing.G2_GENERATOR),
        )
        assert eab == pairing.f12_pow(e1, a * b)


class TestKZG:
    @pytest.fixture(scope="class")
    def srs(self):
        return kzg.SRS.setup(degree=16)

    def test_open_verify(self, srs):
        coeffs = [RNG.randrange(params.FR_MODULUS) for _ in range(9)]
        c = kzg.commit(srs, coeffs)
        z = RNG.randrange(params.FR_MODULUS)
        y, w = kzg.open_at(srs, coeffs, z)
        assert y == ntt.poly_eval(coeffs, z)
        assert kzg.verify(srs, c, z, y, w)
        assert not kzg.verify(srs, c, z, (y + 1) % params.FR_MODULUS, w)

    def test_batch_verify(self, srs):
        openings = []
        for _ in range(3):
            coeffs = [RNG.randrange(params.FR_MODULUS) for _ in range(8)]
            c = kzg.commit(srs, coeffs)
            z = RNG.randrange(params.FR_MODULUS)
            y, w = kzg.open_at(srs, coeffs, z)
            openings.append((c, z, y, w))
        assert kzg.batch_verify(srs, openings)
        bad = list(openings)
        c, z, y, w = bad[0]
        bad[0] = (c, z, (y + 1) % params.FR_MODULUS, w)
        assert not kzg.batch_verify(srs, bad)
