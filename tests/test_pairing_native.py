"""Native pairing engine (native/pairing377.cpp) parity and behavior.

The reference node runs Varuna verification — ending in pairing products —
on every gossiped transaction and solution
(/root/reference/node/bft/ledger-service/src/ledger.rs:312,319-341). The
native engine is what makes that affordable (~3 ms/pairing vs ~1 s for the
auditable pure-Python fallback); these tests pin bit-exactness between the
two and the engine's edge-case behavior.
"""

import pytest

from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import g1, pairing
from snarkos_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.have_pairing(), reason="native pairing engine unavailable"
)

G = (params.G1_GENERATOR_X, params.G1_GENERATOR_Y)
H = pairing.G2_GENERATOR


def _py_multi_pairing(pairs):
    """The pure-Python path, bypassing the native route."""
    f = pairing.F12_ONE
    for p, q in pairing._normalize_pairs(pairs):
        f = pairing.f12_mul(f, pairing.miller_loop(p, q))
    return pairing.final_exponentiation(f)


def test_single_pairing_bit_exact():
    ref = _py_multi_pairing([(G, H)])  # ~1 s, the one slow Python pairing
    assert native.multi_pairing([(G, H)]) == ref


def test_bilinearity_native_only():
    # e(aP, Q) * e(-P, aQ) == 1, entirely on the native engine
    a = 0xDEADBEEFCAFEF00D
    aP = g1.affine(g1.scalar_mul(a, g1.from_affine(G)))
    negP = (G[0], (-G[1]) % params.FQ_MODULUS)
    aQ = pairing.g2_scalar_mul(a, H)
    assert native.pairing_check([(aP, H), (negP, aQ)]) is True
    # and e(aP, Q) == e(P, aQ) at the exact-value level
    assert native.multi_pairing([(aP, H)]) == native.multi_pairing([(G, aQ)])


def test_tampered_product_fails():
    a = 12345678901234567
    aP = g1.affine(g1.scalar_mul(a, g1.from_affine(G)))
    negP = (G[0], (-G[1]) % params.FQ_MODULUS)
    aQ = pairing.g2_scalar_mul(a + 1, H)  # wrong scalar
    assert native.pairing_check([(aP, H), (negP, aQ)]) is False


def test_off_curve_rejected():
    bad = (G[0], (G[1] + 1) % params.FQ_MODULUS)
    assert native.pairing_check([(bad, H)]) is None  # caller falls back
    assert native.multi_pairing([(bad, H)]) is None
    bad_g2 = ((H[0][0], H[0][1]), (H[1][0], (H[1][1] + 1) % params.FQ_MODULUS))
    assert native.pairing_check([(G, bad_g2)]) is None


def test_infinity_pairs():
    # e(O, Q) = e(P, O) = 1
    assert native.pairing_check([(None, H)]) is True
    assert native.pairing_check([(G, None)]) is True
    assert native.multi_pairing([(None, H)]) == pairing.F12_ONE


def test_g2_scalar_mul_parity():
    # pure-Python double-and-add vs native Jacobian ladder
    k = 0x1234567890ABCDEF1234567890ABCDEF
    py = None
    acc = None
    for bit in bin(k)[2:]:
        acc = pairing.g2_add(acc, acc)
        if bit == "1":
            acc = pairing.g2_add(acc, H)
    py = acc
    assert native.g2_scalar_mul(k, H) == py
    assert pairing.g2_on_curve(py)


def test_g2_scalar_mul_small_values():
    assert native.g2_scalar_mul(1, H) == H
    two_native = native.g2_scalar_mul(2, H)
    assert two_native == pairing.g2_add(H, H)


def test_module_routing():
    """pairing.pairing_check and multi_pairing agree with each other and
    with the ==F12_ONE convention at the module level."""
    a = 999
    aP = g1.affine(g1.scalar_mul(a, g1.from_affine(G)))
    negP = (G[0], (-G[1]) % params.FQ_MODULUS)
    aQ = pairing.g2_scalar_mul(a, H)
    assert pairing.pairing_check([(aP, H), (negP, aQ)]) is True
    assert pairing.multi_pairing([(aP, H), (negP, aQ)]) == pairing.F12_ONE
    # Jacobian G1 inputs are normalized identically on both routes
    jac = g1.scalar_mul(a, g1.from_affine(G))
    assert pairing.pairing_check([(jac, H), (negP, aQ)]) is True


def test_native_pairing_latency():
    """The round-4 perf contract: a 2-pairing check (the per-transmission
    admission cost) stays under 50 ms — ~40x headroom over the ~2 s
    pure-Python cost it replaced, with slack for slow CI boxes."""
    import time

    a = 777
    aP = g1.affine(g1.scalar_mul(a, g1.from_affine(G)))
    negP = (G[0], (-G[1]) % params.FQ_MODULUS)
    aQ = pairing.g2_scalar_mul(a, H)
    native.pairing_check([(aP, H), (negP, aQ)])  # warm
    t0 = time.perf_counter()
    for _ in range(5):
        assert native.pairing_check([(aP, H), (negP, aQ)]) is True
    dt = (time.perf_counter() - t0) / 5
    assert dt < 0.05, f"2-pairing check took {dt*1000:.1f} ms"
