"""Native Poseidon-Fr sponge (native/poseidon377.cpp) parity vs the pure
Python ground truth (crypto/ref/poseidon.py).

The sponge drives every Fiat-Shamir transcript (Varuna verify runs ~330
permutations per gossiped transaction — reference semantics
/root/reference/node/bft/ledger-service/src/ledger.rs:319-341), so the
native path must match the reference permutation bit-for-bit.
"""

import pytest

from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import poseidon as P
from snarkos_tpu.utils import native

R = params.FR_MODULUS

pytestmark = pytest.mark.skipif(
    not native.have_poseidon(), reason="native poseidon engine unavailable"
)


def _py_hash_many(inputs, rate, m, domain):
    """The pure-Python sponge, bypassing the native route in hash_many."""
    state = [0] * (rate + 1)
    state[0] = P._domain_to_field(domain)
    pos = 0
    for x in inputs:
        if pos == rate:
            state = P.permute(state, rate)
            pos = 0
        state[1 + pos] = (state[1 + pos] + x) % R
        pos += 1
    out = []
    while len(out) < m:
        state = P.permute(state, rate)
        out.extend(state[1 : 1 + min(rate, m - len(out))])
    return out


@pytest.mark.parametrize("rate", [2, 4])
@pytest.mark.parametrize("n", [0, 1, 2, 5, 9])
def test_hash_many_parity(rate, n):
    import random

    rng = random.Random(1000 * rate + n)
    inputs = [rng.randrange(R) for _ in range(n)]
    for m in (1, 3):
        for dom in ("", "snarkos_tpu.transcript"):
            ref = _py_hash_many(inputs, rate, m, dom)
            got = native.poseidon_hash_many(inputs, rate, m,
                                            P._domain_to_field(dom))
            assert got == ref


def test_module_routing_matches():
    """hash_many (which routes native-first) equals the bypassed Python."""
    inputs = [3, 1, 4, 1, 5, 9, 2, 6]
    assert P.hash_many(inputs, 2, 2, "d") == _py_hash_many(inputs, 2, 2, "d")
    assert P.hash1([7, 8], 2) == _py_hash_many([7, 8], 2, 1, "")[0]


def test_large_input_reduction():
    """Inputs >= R are reduced mod R on both paths identically."""
    big = R + 12345
    assert P.hash1([big], 2) == _py_hash_many([big % R], 2, 1, "")[0]


def test_native_throughput():
    import time

    native.poseidon_hash_many([1, 2], 2, 1, 0)  # warm + init tables
    t0 = time.perf_counter()
    for _ in range(200):
        native.poseidon_hash_many([1, 2], 2, 1, 0)
    dt = (time.perf_counter() - t0) / 200
    # pure Python is ~600 us/permutation; native must stay well under
    assert dt < 0.002, f"native hash1 took {dt*1e6:.0f} us"
