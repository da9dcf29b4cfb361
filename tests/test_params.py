"""Computational verification of every constant in crypto/params.py."""

import random

from snarkos_tpu.crypto import params


def _is_prime(n: int, k: int = 30) -> bool:
    if n < 2:
        return False
    for p in [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37]:
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    rng = random.Random(0xC0FFEE)
    for _ in range(k):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def test_moduli_prime():
    assert _is_prime(params.FQ_MODULUS)
    assert _is_prime(params.FR_MODULUS)
    assert _is_prime(params.EDWARDS_SUBGROUP_ORDER)


def test_bls_family_identities():
    x = params.BLS_X
    assert params.FR_MODULUS == x**4 - x**2 + 1
    assert params.FQ_MODULUS == ((x - 1) ** 2 * params.FR_MODULUS) // 3 + x


def test_two_adicity():
    for modulus, adicity in [
        (params.FR_MODULUS, params.FR_TWO_ADICITY),
        (params.FQ_MODULUS, params.FQ_TWO_ADICITY),
    ]:
        t, s = modulus - 1, 0
        while t % 2 == 0:
            t //= 2
            s += 1
        assert s == adicity


def test_fr_root_of_unity():
    r = params.FR_MODULUS
    assert pow(params.FR_GENERATOR, (r - 1) // 2, r) == r - 1  # QNR
    root = pow(params.FR_GENERATOR, (r - 1) >> params.FR_TWO_ADICITY, r)
    assert root == params.FR_ROOT_OF_UNITY
    assert pow(root, 1 << (params.FR_TWO_ADICITY - 1), r) == r - 1


def test_g1_generator():
    q = params.FQ_MODULUS
    x, y = params.G1_GENERATOR_X, params.G1_GENERATOR_Y
    assert (y * y - (x**3 + params.G1_COEFF_B)) % q == 0

    from snarkos_tpu.crypto.ref import g1

    assert g1.is_infinity(g1.scalar_mul(params.FR_MODULUS, g1.GENERATOR))


def test_edwards_generator():
    r = params.FR_MODULUS
    d = params.EDWARDS_D
    x, y = params.EDWARDS_GENERATOR_X, params.EDWARDS_GENERATOR_Y
    assert (-x * x + y * y - 1 - d * x * x % r * y % r * y) % r == 0

    from snarkos_tpu.crypto.ref import edwards

    assert edwards.scalar_mul(params.EDWARDS_SUBGROUP_ORDER, edwards.GENERATOR) == edwards.IDENTITY


def test_montgomery_constants():
    assert params.FQ_MONT_R == pow(2, 16 * 24, params.FQ_MODULUS)
    # n0inv really is -p^{-1} mod 2^16
    assert params.FQ_N0INV * params.FQ_MODULUS % (1 << 16) == (1 << 16) - 1
    assert params.FR_N0INV * params.FR_MODULUS % (1 << 16) == (1 << 16) - 1
