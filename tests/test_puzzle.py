"""Puzzle prove/verify pipeline. The full TPU path (Poseidon leafgen ->
epoch program -> MSM commit -> KZG open) runs only on TPU hardware
(Pallas kernels); on CPU we validate the host-side verification path
against reference-built solutions, including the EPOCH-PROGRAM binding
(solutions proved against another epoch's relation must be rejected —
the reference synthesizes a fresh circuit per epoch,
node/src/prover/mod.rs:254-258)."""

import os

import pytest

from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import kzg as ref_kzg, ntt as ref_ntt, poseidon as ref_poseidon

pytestmark = pytest.mark.slow  # device-op tier: XLA:CPU compile-heavy (README two-tier run)


def _is_tpu():
    import jax

    return jax.default_backend() == "tpu"


@pytest.fixture(scope="module")
def small_puzzle():
    os.environ["SNARKOS_TPU_PUZZLE_LOG_DEGREE"] = "6"
    from snarkos_tpu.ops.puzzle import Puzzle

    return Puzzle(log_degree=6)


def _host_coeffs(pz, epoch_hash, address, nonce):
    """Host reference of the full coefficient derivation: Poseidon leaves
    through the epoch program (EpochProgram.apply_host)."""
    seed = pz._seed_field(epoch_hash, address, nonce)
    leaves = [
        ref_poseidon.hash_many([seed, i], rate=2, domain="snarkos_tpu.puzzle.coeff")[0]
        for i in range(pz.k)
    ]
    return pz.epoch_program(epoch_hash).apply_host(leaves)


def _host_solution(pz, epoch_hash, address, nonce):
    from snarkos_tpu.ops.puzzle import _g1_to_bytes

    coeffs = _host_coeffs(pz, epoch_hash, address, nonce)
    c_pt = ref_kzg.commit(pz.srs.srs_ref, coeffs)
    c_bytes = _g1_to_bytes(c_pt)
    z = pz._challenge(c_bytes)
    y, w_pt = ref_kzg.open_at(pz.srs.srs_ref, coeffs, z)
    return c_bytes, y, _g1_to_bytes(w_pt)


class TestPuzzleHostSide:
    def test_verify_accepts_reference_built_solution(self, small_puzzle):
        """Build the same pipeline host-side with the reference KZG and
        check puzzle.verify accepts it."""
        pz = small_puzzle
        epoch_hash, address, nonce = b"\x07" * 32, "aleo1deadbeef", 99
        c_bytes, y, w_bytes = _host_solution(pz, epoch_hash, address, nonce)
        # verify with an always-passing target
        assert pz.verify(epoch_hash, address, nonce, c_bytes, y, w_bytes,
                         proof_target=1)
        # tampered y fails
        assert not pz.verify(epoch_hash, address, nonce, c_bytes,
                             (y + 1) % params.FR_MODULUS, w_bytes, proof_target=1)
        # tampered witness fails
        from snarkos_tpu.ops.puzzle import _g1_to_bytes

        bad_w = _g1_to_bytes(ref_kzg.g1.scalar_mul(3, ref_kzg.g1.GENERATOR))
        assert not pz.verify(epoch_hash, address, nonce, c_bytes, y, bad_w,
                             proof_target=1)
        # garbage commitment encoding fails cleanly
        assert not pz.verify(epoch_hash, address, nonce, b"\xff" * 97, y,
                             w_bytes, proof_target=1)

    def test_epoch_binding_rejects_other_epoch(self, small_puzzle):
        """A solution proved against epoch A's relation must NOT verify
        under epoch B (the new-circuit-per-epoch property), nor under a
        different address or nonce."""
        pz = small_puzzle
        epoch_a, epoch_b = b"\x0a" * 32, b"\x0b" * 32
        address, nonce = "aleo1epochtest", 5
        c_bytes, y, w_bytes = _host_solution(pz, epoch_a, address, nonce)
        assert pz.verify(epoch_a, address, nonce, c_bytes, y, w_bytes, 1)
        assert not pz.verify(epoch_b, address, nonce, c_bytes, y, w_bytes, 1)
        assert not pz.verify(epoch_a, "aleo1somebodyelse", nonce, c_bytes, y,
                             w_bytes, 1)
        assert not pz.verify(epoch_a, address, nonce + 1, c_bytes, y, w_bytes, 1)

    def test_cheap_constant_polynomial_rejected(self, small_puzzle):
        """A constant polynomial C = a*G with y = a passes the PAIRING but
        must fail the epoch binding — without the binding, grinding the
        target costs one scalar-mul per try instead of the epoch program
        plus two MSMs."""
        from snarkos_tpu.ops.puzzle import _g1_to_bytes

        pz = small_puzzle
        a = 123456789
        c_bytes = _g1_to_bytes(ref_kzg.g1.scalar_mul(a, ref_kzg.g1.GENERATOR))
        z = pz._challenge(c_bytes)
        # constant poly: p(z) = a, witness = identity
        w_bytes = _g1_to_bytes(ref_kzg.g1.INFINITY)
        assert ref_kzg.verify(pz.srs.srs_ref,
                              ref_kzg.g1.scalar_mul(a, ref_kzg.g1.GENERATOR),
                              z, a, ref_kzg.g1.INFINITY)  # pairing alone passes!
        assert not pz.verify(b"\x07" * 32, "aleo1cheater", 1, c_bytes, a,
                             w_bytes, proof_target=1)

    def test_epoch_program_device_matches_host(self, small_puzzle):
        """The device epoch transform is bit-exact vs apply_host."""
        import jax.numpy as jnp
        import numpy as np

        from snarkos_tpu.ops.fieldspec import FR

        pz = small_puzzle
        prog = pz.epoch_program(b"\x33" * 32)
        leaves = [i * 7 + 1 for i in range(pz.k)]
        want = prog.apply_host(leaves)
        arr = jnp.array(FR.encode(leaves, mont=True)).reshape(FR.nlimbs, 1, pz.k)
        got = FR.decode(np.asarray(prog.apply(arr)[:, 0, :]), mont=True)
        assert got == want

    def test_target_semantics(self, small_puzzle):
        pz = small_puzzle
        assert pz.passes_target(0, 1)
        assert pz.passes_target((1 << 64) // 4, 4)
        assert not pz.passes_target((1 << 64) // 4 + 1, 4)

    @pytest.mark.slow
    def test_verify_batch_two_pairings(self, small_puzzle):
        """verify_batch collapses N solutions into one RLC batch check
        (ops/kzg.batch_verify); all-valid passes, one tamper fails."""
        pz = small_puzzle
        epoch_hash, address = b"\x07" * 32, "aleo1batch"
        items = []
        for nonce in (1, 2):
            c_bytes, y, w_bytes = _host_solution(pz, epoch_hash, address, nonce)
            items.append((epoch_hash, address, nonce, c_bytes, y, w_bytes, 1))
        assert pz.verify_batch(items)
        assert pz.verify_batch([])
        assert pz.verify_batch(items[:1])
        eh, ad, nn, c_bytes, y, w_bytes, tgt = items[0]
        bad = [(eh, ad, nn, c_bytes, (y + 1) % params.FR_MODULUS, w_bytes, tgt),
               items[1]]
        assert not pz.verify_batch(bad)


@pytest.mark.skipif(not _is_tpu(), reason="TPU-only: Pallas MSM path")
class TestPuzzleTPU:
    def test_prove_then_verify(self, small_puzzle):
        pz = small_puzzle
        sol = pz.prove(b"\x01" * 32, "aleo1prover", nonce=5, proof_target=None)
        assert sol is not None
        assert pz.verify(b"\x01" * 32, "aleo1prover", 5, sol.commitment,
                         sol.eval_y, sol.witness, proof_target=1)


class TestTransactions:
    def test_create_and_verify(self, small_puzzle):
        from snarkos_tpu.node.ledger import create_transaction, verify_transaction

        tx = create_transaction(b"payload-xyz", fee=3)
        assert verify_transaction(tx)
        # tampering with the binding or the public tag breaks the proof
        from dataclasses import replace

        assert not verify_transaction(replace(tx, payload=b"payload-xyy"))
        assert not verify_transaction(replace(tx, fee=4))
        assert not verify_transaction(
            replace(tx, auth_tag=(tx.auth_tag + 1) % params.FR_MODULUS))


class TestBatchedProving:
    def test_prove_batch_matches_single(self, small_puzzle):
        """prove_batch(B nonces) produces exactly the per-nonce prove()
        results (one batched Poseidon dispatch, VERDICT r1 item 8)."""
        pz = small_puzzle
        nonces = [11, 12, 13]
        batch = pz.prove_batch(b"\x02" * 32, "aleo1prover", nonces, None)
        assert len(batch) == len(nonces)
        for n, got in zip(nonces, batch):
            single = pz.prove(b"\x02" * 32, "aleo1prover", n, None)
            assert got.commitment == single.commitment
            assert got.eval_y == single.eval_y
            assert got.witness == single.witness
            assert got.solution_id == single.solution_id
