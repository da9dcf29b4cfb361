"""Varuna-style holographic AHP proof system: completeness, soundness
probes (including third-sumcheck/index tampering and degree-bound
shadows), hiding, wire roundtrip, and transcript domain separation
(crypto/ref/varuna.py; capability match for
ledger-service/src/ledger.rs:318-343 transaction verification)."""

import copy

import pytest

from snarkos_tpu.crypto.ref import kzg, r1cs, varuna

R = varuna.R


@pytest.fixture(scope="module")
def setup():
    cs, kv = r1cs.auth_circuit()
    srs = kzg.SRS.setup(degree=varuna.required_srs_degree(cs))
    k, m = 0xDEADBEEF, 0xC0FFEE
    t = r1cs.auth_statement(k, m)
    z = r1cs.auth_assignment(cs, kv, k, m, t)
    proof = varuna.prove(srs, cs, z, mask_seed=b"\x42" * 32)
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


def test_hiding_masks_change_proof_not_validity(setup):
    """Different mask seeds produce different commitments/evals (the
    openings are blinded) while every proof verifies — the zk property's
    observable surface."""
    cs, kv, srs, k, m, t, z, proof = setup
    proof2 = varuna.prove(srs, cs, z, mask_seed=b"\x43" * 32)
    assert varuna.verify(srs, cs, [1, m, t, 0], proof2)
    # witness-carrying openings differ under a different mask
    assert proof2.evals[:4] != proof.evals[:4]
    # determinism: same seed -> identical proof bytes (dev genesis relies
    # on this)
    proof3 = varuna.prove(srs, cs, z, mask_seed=b"\x42" * 32)
    assert proof3.serialize() == proof.serialize()


def test_wire_roundtrip(setup):
    cs, kv, srs, k, m, t, z, proof = setup
    blob = proof.serialize()
    back = varuna.VarunaProof.deserialize(blob)
    assert back.evals == proof.evals
    assert back.sigmas == proof.sigmas
    assert varuna.verify(srs, cs, [1, m, t, 0], back)


def test_soundness_probes(setup):
    cs, kv, srs, k, m, t, z, proof = setup
    pub = [1, m, t, 0]
    # every single tampered evaluation must be rejected (beta AND delta
    # groups: 8 + 18)
    for i in range(len(proof.evals)):
        bad = copy.deepcopy(proof)
        bad.evals[i] = (bad.evals[i] + 1) % R
        assert not varuna.verify(srs, cs, pub, bad), f"eval {i} tamper passed"
    # tampered sigma (the third-sumcheck claim) must be rejected
    for i in range(3):
        bad = copy.deepcopy(proof)
        bad.sigmas[i] = (bad.sigmas[i] + 1) % R
        assert not varuna.verify(srs, cs, pub, bad), f"sigma {i} tamper passed"
    # tampered commitments change the transcript -> openings fail
    for i in range(len(proof.commitments)):
        bad = copy.deepcopy(proof)
        bad.commitments[i] = proof.commitments[(i + 1) % len(proof.commitments)]
        assert not varuna.verify(srs, cs, pub, bad), f"commitment {i} tamper passed"
    # wrong statement
    assert not varuna.verify(srs, cs, [1, m, (t + 1) % R, 0], proof)
    assert not varuna.verify(srs, cs, [1, (m + 1) % R, t, 0], proof)
    # tampered batch witnesses
    bad = copy.deepcopy(proof)
    bad.witness_beta = proof.commitments[0]
    assert not varuna.verify(srs, cs, pub, bad)
    bad = copy.deepcopy(proof)
    bad.witness_delta = proof.commitments[0]
    assert not varuna.verify(srs, cs, pub, bad)


def test_index_tamper_rejected(setup):
    """Verifying against a DIFFERENT circuit's index (tampered matrix
    polynomials) must fail: the third sumcheck binds the proof to the
    committed matrices."""
    cs, kv, srs, k, m, t, z, proof = setup
    cs2, _ = r1cs.auth_circuit()
    cs2.rows_a[0] = dict(cs2.rows_a[0])
    first_var = next(iter(cs2.rows_a[0]))
    cs2.rows_a[0][first_var] = (cs2.rows_a[0][first_var] + 1) % R
    idx2 = varuna.index_circuit(srs, cs2)
    out = varuna.verify_prepare(cs, [1, m, t, 0], proof, srs=srs, index=idx2)
    assert out is None or not kzg.batch_verify(srs, out)


def test_degree_bound_enforced(setup):
    """A proof whose s_1 shadow does not equal X^shift * g_1 must fail the
    shadow check — this is what pins deg g_1 <= n-2 (the round-2 build
    left it unenforced)."""
    cs, kv, srs, k, m, t, z, proof = setup
    bad = copy.deepcopy(proof)
    # claim a different shadow evaluation consistent with nothing
    bad.evals[6] = (bad.evals[6] + 1) % R  # y_s1
    assert not varuna.verify(srs, cs, [1, m, t, 0], bad)


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
