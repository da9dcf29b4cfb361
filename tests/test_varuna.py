"""Varuna-style AHP proof system: completeness, soundness probes, wire
roundtrip, and transcript domain separation (crypto/ref/varuna.py;
capability match for ledger-service/src/ledger.rs:318-343 transaction
verification)."""

import copy

import pytest

from snarkos_tpu.crypto.ref import kzg, r1cs, varuna

R = varuna.R


@pytest.fixture(scope="module")
def setup():
    cs, kv = r1cs.auth_circuit()
    srs = kzg.SRS.setup(degree=cs.n)
    k, m = 0xDEADBEEF, 0xC0FFEE
    t = r1cs.auth_statement(k, m)
    z = r1cs.auth_assignment(cs, kv, k, m, t)
    proof = varuna.prove(srs, cs, z)
    return cs, kv, srs, k, m, t, z, proof


def test_circuit_satisfiability(setup):
    cs, kv, srs, k, m, t, z, proof = setup
    assert cs.is_satisfied(z)
    z_bad = list(z)
    z_bad[kv] = (z_bad[kv] + 1) % R
    assert not cs.is_satisfied(z_bad)
    # wrong tag is unsatisfiable through honest tracing
    z_wrong = r1cs.auth_assignment(cs, kv, k, m, (t + 1) % R)
    assert not cs.is_satisfied(z_wrong)


def test_completeness(setup):
    cs, kv, srs, k, m, t, z, proof = setup
    assert varuna.verify(srs, cs, [1, m, t, 0], proof)


def test_wire_roundtrip(setup):
    cs, kv, srs, k, m, t, z, proof = setup
    blob = proof.serialize()
    back = varuna.VarunaProof.deserialize(blob)
    assert back.evals == proof.evals
    assert varuna.verify(srs, cs, [1, m, t, 0], back)


def test_soundness_probes(setup):
    cs, kv, srs, k, m, t, z, proof = setup
    pub = [1, m, t, 0]
    # every single tampered evaluation must be rejected
    for i in range(7):
        bad = copy.deepcopy(proof)
        bad.evals[i] = (bad.evals[i] + 1) % R
        assert not varuna.verify(srs, cs, pub, bad), f"eval {i} tamper passed"
    # tampered commitments change the transcript -> openings fail
    for i in range(7):
        bad = copy.deepcopy(proof)
        bad.commitments[i] = proof.commitments[(i + 1) % 7]
        assert not varuna.verify(srs, cs, pub, bad), f"commitment {i} tamper passed"
    # wrong statement
    assert not varuna.verify(srs, cs, [1, m, (t + 1) % R, 0], proof)
    assert not varuna.verify(srs, cs, [1, (m + 1) % R, t, 0], proof)
    # tampered batch witness
    bad = copy.deepcopy(proof)
    bad.batch_witness = proof.commitments[0]
    assert not varuna.verify(srs, cs, pub, bad)


def test_proof_bound_to_key_not_reusable(setup):
    """A proof for (m, t(k, m)) must not verify for another binding m'."""
    cs, kv, srs, k, m, t, z, proof = setup
    m2 = (m + 1) % R
    t2 = r1cs.auth_statement(k, m2)
    assert not varuna.verify(srs, cs, [1, m2, t2, 0], proof)


def test_malformed_proof_bytes_rejected(setup):
    cs, kv, srs, k, m, t, z, proof = setup
    blob = bytearray(proof.serialize())
    blob[5] ^= 0xFF  # corrupt a commitment coordinate
    try:
        bad = varuna.VarunaProof.deserialize(bytes(blob))
    except ValueError:
        return  # rejected at decode (off-curve / non-canonical)
    assert not varuna.verify(srs, cs, [1, m, t, 0], bad)
