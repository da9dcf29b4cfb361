"""Reference KZG polynomial commitment over BLS12-377 (Varuna PC core).

snarkOS reaches this through snarkVM's Varuna verifier on every gossiped
transaction (SURVEY.md §2.10 "Transaction verify"). This module is the
host-side ground truth: commit/open are MSMs (accelerated on TPU by
``ops/msm.py``), verification is two pairings on host.

    commit(p)      = sum_i p_i * tau^i * G1          (an MSM)
    open(p, z)     = commit((p(X) - p(z)) / (X - z))
    verify(C,z,y,W): e(C - y*G, H) == e(W, tau*H - z*H)
"""

from __future__ import annotations

from dataclasses import dataclass

from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import g1, ntt, pairing

R = params.FR_MODULUS


@dataclass
class SRS:
    """Structured reference string (test-only trusted setup)."""

    powers_g1: list  # [G, tau G, ..., tau^d G] as Jacobian tuples
    h: tuple  # G2 generator (affine Fq2 pair)
    tau_h: tuple  # tau * H

    @classmethod
    def setup(cls, degree: int, tau: int | None = None, seed: int = 0x5EED) -> "SRS":
        if tau is None:
            # deterministic test tau (NOT secure; fine for vectors/bench)
            tau = pow(params.FR_GENERATOR, seed + 12345, R)
        taus = []
        acc = 1
        for _ in range(degree + 1):
            taus.append(acc)
            acc = acc * tau % R
        powers = cls._powers_native(taus)
        if powers is None:
            powers = [g1.scalar_mul(t, g1.GENERATOR) for t in taus]
        h = pairing.G2_GENERATOR
        tau_h = pairing.g2_scalar_mul(tau, h)
        return cls(powers_g1=powers, h=h, tau_h=tau_h)

    @staticmethod
    def _powers_native(taus: list):
        """Per-power scalar muls through the native G1 engine (~50x the
        pure-Python ladder; execution circuits need degree-2^15 SRS,
        minutes in Python). Bit-exact: results are normalized affine."""
        if len(taus) < 64:
            return None
        from snarkos_tpu.utils import native

        if not native.have_g1():
            return None
        gen_aff = g1.affine(g1.GENERATOR)
        powers = []
        for t in taus:
            j = native.g1_msm([t], [gen_aff])
            if j is None:
                return None
            powers.append(g1.from_affine(g1.affine(j)))
        return powers


_SRS_AFFINE_CACHE: dict = {}


def _srs_affine(srs: SRS):
    """Affine powers for the native engine, cached per SRS identity
    (several SRS objects coexist: the puzzle SRS and the trimmed Varuna
    committer key — keep a small multi-entry cache, never thrash)."""
    key = id(srs)
    cached = _SRS_AFFINE_CACHE.get(key)
    if cached is None or len(cached) < len(srs.powers_g1):
        cached = [g1.affine(p) for p in srs.powers_g1]
        if len(_SRS_AFFINE_CACHE) > 4:
            _SRS_AFFINE_CACHE.clear()
        _SRS_AFFINE_CACHE[key] = cached
    return cached


def commit(srs: SRS, coeffs: list[int]):
    assert len(coeffs) <= len(srs.powers_g1)
    from snarkos_tpu.utils import native

    if native.have_g1():
        out = native.g1_msm([c % R for c in coeffs],
                            _srs_affine(srs)[: len(coeffs)])
        if out is not None:
            return out
    return g1.msm(coeffs, srs.powers_g1[: len(coeffs)])


def open_at(srs: SRS, coeffs: list[int], z: int):
    """Returns (y, witness) with y = p(z), witness = commit(q),
    q = (p - y) / (X - z) via synthetic division."""
    y = ntt.poly_eval(coeffs, z)
    # synthetic division of (p(X) - y) by (X - z), highest-first
    q = [0] * (len(coeffs) - 1)
    carry = 0
    for i in range(len(coeffs) - 1, 0, -1):
        carry = (coeffs[i] + carry * z) % R
        q[i - 1] = carry
    witness = commit(srs, q) if q else g1.INFINITY
    return y, witness


def verify(srs: SRS, commitment, z: int, y: int, witness) -> bool:
    """e(C - y G, H) == e(W, tau H - z H)."""
    lhs_g1 = g1.add(commitment, g1.neg(g1.scalar_mul(y, g1.GENERATOR)))
    rhs_g2 = pairing.g2_add(srs.tau_h, pairing.g2_neg(pairing.g2_scalar_mul(z, srs.h)))
    # e(lhs, H) * e(-W, rhs) == 1
    return pairing.pairing_check(
        [
            (g1.affine(lhs_g1), srs.h),
            (g1.affine(g1.neg(witness)), rhs_g2),
        ]
    )


def batch_verify(srs: SRS, openings, rng_seed: int = 1) -> bool:
    """Random-linear-combination batch verification of (C, z, y, W) tuples
    sharing the same z per group. Generic version: combine pairings
        prod_i e(C_i - y_i G + z_i W_i, H) * e(-W_i, tau H) == 1
    with random coefficients gamma^i."""
    gamma = pow(5, rng_seed + 7, R)
    acc_left = g1.INFINITY  # sum gamma^i (C_i - y_i G + z_i W_i)
    acc_w = g1.INFINITY  # sum gamma^i W_i
    coeff = 1
    for commitment, z, y, witness in openings:
        term = g1.add(commitment, g1.neg(g1.scalar_mul(y, g1.GENERATOR)))
        term = g1.add(term, g1.scalar_mul(z, witness))
        acc_left = g1.add(acc_left, g1.scalar_mul(coeff, term))
        acc_w = g1.add(acc_w, g1.scalar_mul(coeff, witness))
        coeff = coeff * gamma % R
    return pairing.pairing_check(
        [
            (g1.affine(acc_left), srs.h),
            (g1.affine(g1.neg(acc_w)), srs.tau_h),
        ]
    )
