"""The TPU puzzle: the framework's proof-of-work pipeline (flagship model).

Re-designs the capability of Aleo's puzzle (SURVEY.md §2.10: `puzzle.prove`
at node/src/prover/mod.rs:254-258, `puzzle.check_solution` at
ledger-service/src/ledger.rs:306-315) as a TPU-first pipeline:

  prove(epoch_hash, address, nonce):
    1. seed  = sha256(epoch_hash || address || nonce)
    2. leaves[i] = Poseidon(seed_field, i)     — batched sponge on TPU
    3. coeffs = EpochProgram(epoch_hash)(leaves) — the per-epoch relation
    4. C = KZG commit = MSM(coeffs, SRS)       — Pippenger on TPU
    5. z = Poseidon(C.x) challenge (Fiat-Shamir)
    6. y = p(z); W = MSM((p - y)/(X - z), SRS) — opening proof on TPU
    7. solution passes iff sha64(C || y) <= 2^64 / proof_target

  verify(solution): re-derive the coefficients for (epoch_hash, address,
    nonce) THROUGH THE EPOCH PROGRAM, check eval_y == p(z) (binds the
    commitment to the epoch relation — without this, a constant
    polynomial grinds the target with one scalar-mul per try), recompute
    z, then the pairing equation
    e(C - y G, H) == e(W, tau H - z H)  (host-side pairings), plus target.

The EPOCH PROGRAM mirrors the reference's new-circuit-per-epoch property
(node/src/prover/mod.rs:254-258 reaches snarkVM's synthesis puzzle, which
synthesizes a fresh epoch-dependent R1CS each epoch): a pseudo-random
arithmetic program — per-step wiring permutations, op selectors, and
field constants all derived from the epoch hash — transforms the Poseidon
leaves. TPU-first twist: the compiled dataflow is FIXED (one XLA program
for every epoch); the per-epoch tensors arrive as runtime inputs, so
epoch rollover costs zero recompilation while still defeating
fixed-dataflow hardware and cross-epoch caching. Verification re-runs
the program for ONE nonce (the reference's check_solution likewise
re-synthesizes) but needs NO MSM — only a device dot product + pairings.
The SRS is a deterministic dev setup (NOT a production ceremony).
"""

from __future__ import annotations

import functools
import hashlib
import os
import time
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import edwards, g1 as ref_g1, kzg as ref_kzg, pairing, poseidon as ref_poseidon
from snarkos_tpu.ops import g1 as g1ops, kzg as kzg_ops, modarith as fa, msm as msm_mod, poseidon as poseidon_ops
from snarkos_tpu.ops.fieldspec import FQ, FR

R = params.FR_MODULUS
COEFF_DOMAIN = "snarkos_tpu.puzzle.coeff"
CHALLENGE_DOMAIN = "snarkos_tpu.puzzle.challenge"

DEFAULT_LOG_DEGREE = 12


def _g1_to_bytes(p) -> bytes:
    """Reference Jacobian tuple -> 97-byte affine encoding."""
    a = ref_g1.affine(p)
    if a is None:
        return b"\x00" * 96 + b"\x01"
    return a[0].to_bytes(48, "little") + a[1].to_bytes(48, "little") + b"\x00"


def _g1_from_bytes(b: bytes):
    if len(b) != 97:
        raise ValueError("bad G1 encoding length")
    if b[96] == 1:
        return ref_g1.INFINITY
    x = int.from_bytes(b[:48], "little")
    y = int.from_bytes(b[48:96], "little")
    q = params.FQ_MODULUS
    if x >= q or y >= q:
        raise ValueError("non-canonical G1 coordinate")
    p = (x, y, 1)
    if not ref_g1.on_curve(p):
        raise ValueError("point not on curve")
    return p


def sha64(*parts: bytes) -> int:
    h = hashlib.sha256(hashlib.sha256(b"".join(parts)).digest()).digest()
    return int.from_bytes(h[:8], "little")


@dataclass
class PuzzleSRS:
    """Device-resident SRS for the puzzle degree."""

    degree: int
    points: "g1ops.JacobianPoints"  # (L, degree+1)
    srs_ref: ref_kzg.SRS  # host copy for verification
    # True when derived from the KNOWN dev tau; ledger trim-fallbacks
    # refuse to mint fresh dev SRS when this is False (artifact mode)
    is_dev: bool = True

    _cache: dict = None

    @classmethod
    def from_artifact(cls, path: str, digest: str | None = None,
                      log_degree: int = DEFAULT_LOG_DEGREE) -> "PuzzleSRS":
        """Load a ceremony powers-of-tau artifact (crypto/srs_artifact.py:
        digest pinning + pairing consistency validation). The device gets
        the first ``2^log_degree + 1`` powers; the FULL artifact stays on
        ``srs_ref`` so Varuna/execution circuits can trim larger degrees
        from the same ceremony."""
        from snarkos_tpu.crypto import srs_artifact

        srs_ref = srs_artifact.load_srs(path, digest)
        degree = 1 << log_degree
        if len(srs_ref.powers_g1) < degree + 1:
            raise srs_artifact.SRSArtifactError(
                f"SRS artifact holds {len(srs_ref.powers_g1)} powers; the "
                f"puzzle needs {degree + 1}")
        pts = g1ops.encode_points(srs_ref.powers_g1[: degree + 1])
        return cls(degree=degree, points=pts, srs_ref=srs_ref, is_dev=False)

    @classmethod
    def dev(cls, log_degree: int = DEFAULT_LOG_DEGREE) -> "PuzzleSRS":
        """Deterministic dev SRS, disk-cached under .cache/."""
        degree = 1 << log_degree
        cache_dir = os.path.join(os.path.dirname(__file__), "..", "..", ".cache")
        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(cache_dir, f"srs_{log_degree}.npz")
        tau = pow(params.FR_GENERATOR, 0xDEADBEEF, R)
        if os.path.exists(path):
            data = np.load(path)
            xs, ys, zs = data["x"], data["y"], data["z"]
            powers = [
                (x, y, 1) if z else ref_g1.INFINITY
                for x, y, z in zip(
                    FQ.decode_fast(xs), FQ.decode_fast(ys), data["z"]
                )
            ]
            srs_ref = ref_kzg.SRS(
                powers_g1=powers,
                h=pairing.G2_GENERATOR,
                tau_h=pairing.g2_scalar_mul(tau, pairing.G2_GENERATOR),
            )
        else:
            srs_ref = ref_kzg.SRS.setup(degree, tau=tau)
            srs_ref.powers_g1 = [ref_g1.from_affine(ref_g1.affine(p)) for p in srs_ref.powers_g1]
            xs = FQ.encode_fast([p[0] for p in srs_ref.powers_g1])
            ys = FQ.encode_fast([p[1] for p in srs_ref.powers_g1])
            zs = np.array([p[2] for p in srs_ref.powers_g1], dtype=np.int32)
            np.savez(path, x=xs, y=ys, z=zs)
        pts = g1ops.encode_points(srs_ref.powers_g1)
        return cls(degree=degree, points=pts, srs_ref=srs_ref)


# --------------------------------------------------------------------------
# the epoch program (the per-epoch relation; see module docstring)
# --------------------------------------------------------------------------

EPOCH_STEPS = 12


@functools.partial(jax.jit, static_argnums=())
def _epoch_transform(v: jax.Array, perms: jax.Array, sels: jax.Array,
                     consts: jax.Array) -> jax.Array:
    """Run the epoch program: v (L, B, K) Montgomery leaves -> coefficients.

    One lax.scan over EPOCH_STEPS; each step gathers a partner vector u by
    the epoch wiring permutation and selects one of four arithmetic forms
    per lane. All full-width vector ops — the dataflow is epoch-independent
    (compiled once), the tensors are not."""
    from snarkos_tpu.ops import modarith as fa

    def step(v, inp):
        perm, sel, c = inp  # (K,), (1, K), (L, K)
        u = jnp.take(v, perm, axis=-1)
        cb = c[:, None, :]  # broadcast over the nonce batch
        sb = sel[None]  # (1, 1, K)
        prod_vu = fa.mont_mul_impl(FR, v, u)
        v2 = fa.mont_sqr_impl(FR, v)
        u2 = fa.mont_sqr_impl(FR, u)
        prod_vc = fa.mont_mul_impl(FR, v, cb)
        cand0 = fa.add_impl(FR, prod_vu, cb)  # v*u + c
        cand1 = fa.add_impl(FR, v2, u)  # v^2 + u
        cand2 = fa.sub_impl(FR, prod_vc, u)  # v*c - u
        cand3 = fa.add_impl(FR, fa.sub_impl(FR, v2, u2), cb)  # v^2 - u^2 + c
        v = jnp.where(sb == 0, cand0,
                      jnp.where(sb == 1, cand1,
                                jnp.where(sb == 2, cand2, cand3)))
        return v, None

    out, _ = jax.lax.scan(step, v, (perms, sels, consts))
    return out


class EpochProgram:
    """Per-epoch tensors: wiring permutations (EPOCH_STEPS, K), op
    selectors (EPOCH_STEPS, 1, K), Montgomery constants (EPOCH_STEPS, L, K)
    — all derived deterministically from the epoch hash."""

    def __init__(self, epoch_hash: bytes, k: int):
        self.epoch_hash = epoch_hash
        seed = hashlib.sha256(b"snarkos_tpu.epoch.prog" + epoch_hash).digest()
        rng = np.random.default_rng(np.frombuffer(seed, dtype=np.uint32))
        self.perms = jnp.asarray(np.stack(
            [rng.permutation(k) for _ in range(EPOCH_STEPS)]).astype(np.int32))
        self.sels = jnp.asarray(
            rng.integers(0, 4, size=(EPOCH_STEPS, 1, k), dtype=np.int32))
        consts = FR.random(EPOCH_STEPS * k, rng)  # uniform limbs = uniform
        self.consts = jnp.asarray(
            consts.reshape(FR.nlimbs, EPOCH_STEPS, k).transpose(1, 0, 2))

    def apply(self, leaves: jax.Array) -> jax.Array:
        """(L, B, K) Montgomery leaves -> (L, B, K) coefficients."""
        return _epoch_transform(leaves, self.perms, self.sels, self.consts)

    def apply_host(self, leaves: list[int]) -> list[int]:
        """Host reference of ``apply`` over canonical ints (Montgomery is
        transparent to the +/-/* mix, so the canonical-domain recurrence
        is identical). Used by verification tests and host-built vectors."""
        R_ = params.FR_MODULUS
        perms = np.asarray(self.perms)
        sels = np.asarray(self.sels)[:, 0, :]
        consts_c = [
            FR.decode_fast(np.asarray(self.consts[s]), mont=True)
            for s in range(EPOCH_STEPS)
        ]
        v = list(leaves)
        k = len(v)
        for s in range(EPOCH_STEPS):
            perm, sel, c = perms[s], sels[s], consts_c[s]
            u = [v[perm[i]] for i in range(k)]
            nv = [0] * k
            for i in range(k):
                if sel[i] == 0:
                    nv[i] = (v[i] * u[i] + c[i]) % R_
                elif sel[i] == 1:
                    nv[i] = (v[i] * v[i] + u[i]) % R_
                elif sel[i] == 2:
                    nv[i] = (v[i] * c[i] - u[i]) % R_
                else:
                    nv[i] = (v[i] * v[i] - u[i] * u[i] + c[i]) % R_
            v = nv
        return v


@dataclass(frozen=True)
class PuzzleSolutionData:
    """prove() output, pre-serialization (node/types.Solution carries it)."""

    commitment: bytes  # 97
    eval_y: int
    witness: bytes  # 97
    solution_id: int  # sha64(C || y)


class Puzzle:
    """The puzzle engine; one instance per process (holds the SRS)."""

    def __init__(self, log_degree: int = DEFAULT_LOG_DEGREE):
        self.log_degree = log_degree
        srs_path = os.environ.get("SNARKOS_TPU_SRS_PATH")
        if srs_path:
            # production mode: ceremony artifact, digest-pinned + validated
            # (crypto/srs_artifact.py; node/cli.py refuses to start outside
            # --dev without this)
            self.srs = PuzzleSRS.from_artifact(
                srs_path, os.environ.get("SNARKOS_TPU_SRS_DIGEST") or None,
                log_degree)
        else:
            self.srs = PuzzleSRS.dev(log_degree)
        self.k = 1 << log_degree
        self._programs: dict[bytes, EpochProgram] = {}

    def epoch_program(self, epoch_hash: bytes) -> EpochProgram:
        """The per-epoch relation (small LRU: current + adjacent epochs)."""
        prog = self._programs.get(epoch_hash)
        if prog is None:
            prog = EpochProgram(epoch_hash, self.k)
            if len(self._programs) > 4:
                self._programs.clear()
            self._programs[epoch_hash] = prog
        return prog

    # -- coefficient generation (device) ------------------------------------
    def _leaves_device(self, seed_fields: list[int]) -> jax.Array:
        """(L, B, K) Montgomery Fr leaves via counter-mode Poseidon (one
        batched dispatch for all B nonces)."""
        k, b = self.k, len(seed_fields)
        seed = jnp.concatenate(
            [fa.broadcast_const(FR, s, (k,)) for s in seed_fields], axis=-1)
        idx = jnp.tile(jnp.arange(k, dtype=jnp.int32), b)
        ctr = jnp.zeros((FR.nlimbs, b * k), dtype=jnp.int32)
        ctr = ctr.at[0].set(idx & 0xFFFF).at[1].set(idx >> 16)
        ctr = fa.to_mont(FR, ctr)
        inputs = jnp.stack([seed, ctr], axis=0)  # (2, L, B*K)
        leaves = poseidon_ops.hash_fixed(inputs, rate=2, domain=COEFF_DOMAIN)[0]
        return leaves.reshape(FR.nlimbs, b, k)

    def _coeffs_device(self, epoch_hash: bytes, seed_field: int) -> jax.Array:
        """(L, K) coefficients: Poseidon leaves through the epoch program."""
        leaves = self._leaves_device([seed_field])
        return self.epoch_program(epoch_hash).apply(leaves)[:, 0, :]

    def _seed_field(self, epoch_hash: bytes, address: str, nonce: int) -> int:
        h = hashlib.sha256(epoch_hash + address.encode() + nonce.to_bytes(8, "little")).digest()
        return int.from_bytes(h, "little") % R

    # -- proving -------------------------------------------------------------
    def prove(self, epoch_hash: bytes, address: str, nonce: int,
              proof_target: int | None = None) -> PuzzleSolutionData | None:
        """One puzzle iteration; returns None if the target is missed."""
        seed = self._seed_field(epoch_hash, address, nonce)
        coeffs_mont = self._coeffs_device(epoch_hash, seed)
        coeffs_canon = fa.from_mont(FR, coeffs_mont)
        # KZG commit: MSM(coeffs, SRS[0..K))
        commit_pt = msm_mod.msm(
            _slice_points(self.srs.points, self.k), coeffs_canon
        )
        c_jac = g1ops.decode_points(commit_pt)[0]
        c_bytes = _g1_to_bytes(c_jac)
        # Fiat-Shamir challenge from the commitment
        z = self._challenge(c_bytes)
        # open fully on device: parallel eval + closed-form quotient
        # (ops/kzg.py) + witness MSM — no host serial division
        y, witness_pt = kzg_ops.open_at(
            _slice_points(self.srs.points, self.k), coeffs_mont, z
        )
        w_bytes = _g1_to_bytes(g1ops.decode_points(witness_pt)[0])
        solution_id = sha64(c_bytes, y.to_bytes(32, "little"))
        if proof_target is not None and not self.passes_target(solution_id, proof_target):
            return None
        return PuzzleSolutionData(
            commitment=c_bytes, eval_y=y, witness=w_bytes, solution_id=solution_id
        )

    def prove_batch(self, epoch_hash: bytes, address: str, nonces,
                    proof_target: int | None = None) -> list:
        """Prove B nonces per device dispatch (VERDICT r1 item 8; the
        reference runs clamp(cores-2, 1, 6) parallel CPU puzzle instances,
        node/src/prover/mod.rs:122-148 — the TPU analogue is batching).

        Coefficient generation for ALL nonces runs as ONE Poseidon batch
        of B*K lanes; the commit/open MSMs then run back-to-back through
        the same jitted program (compiled once, no host gaps). Returns the
        PuzzleSolutionData list for nonces that pass the target."""
        nonces = list(nonces)
        if not nonces:
            return []
        k = self.k
        # one batched Poseidon dispatch for all B nonces, then the epoch
        # program over the (L, B, K) leaf tensor in one scan
        seeds = [self._seed_field(epoch_hash, address, n) for n in nonces]
        all_coeffs = self.epoch_program(epoch_hash).apply(
            self._leaves_device(seeds))

        pts = _slice_points(self.srs.points, k)
        # BATCHED MSM dispatch (r4 profile: B per-nonce 2^12 MSMs ran at
        # ~14k points/s each — the per-window fixed costs, not the adds,
        # dominate small MSMs). msm_multi folds all B commit MSMs into
        # ONE sort/scan pipeline with per-batch bucket ranges, then the
        # Fiat-Shamir challenges are computed host-side and the B
        # witness MSMs fold the same way; two device syncs total.
        # (TPU only: XLA:CPU compilation of the batched graph explodes —
        # tens of GB — so off-chip the per-nonce stage-parallel loop of
        # r4 stays; correctness of the multi engine is covered by the
        # mock-group tests + the TPU script/bench runs.)
        batched = jax.default_backend() in ("tpu", "axon") and len(nonces) > 1
        if batched:
            canon = fa.from_mont(FR, all_coeffs)  # (16, B, K)
            commit_jacs = g1ops.decode_points(msm_mod.msm_multi(pts, canon))
        else:
            commit_jacs = [
                g1ops.decode_points(
                    msm_mod.msm(pts, fa.from_mont(FR, all_coeffs[:, i, :])))[0]
                for i in range(len(nonces))]
        c_bytes = [_g1_to_bytes(j) for j in commit_jacs]
        zs = [self._challenge(cb) for cb in c_bytes]
        if batched:
            ys, qs = kzg_ops.eval_and_quotient_multi(all_coeffs, zs)
            wit_jacs = g1ops.decode_points(
                msm_mod.msm_multi(pts, fa.from_mont(FR, qs)))
        else:
            opens = [kzg_ops.open_at(pts, all_coeffs[:, i, :], z)
                     for i, z in enumerate(zs)]
            ys = [y for y, _ in opens]
            wit_jacs = [g1ops.decode_points(w)[0] for _, w in opens]
        out = []
        for y, wj, cb in zip(ys, wit_jacs, c_bytes):
            w_bytes = _g1_to_bytes(wj)
            solution_id = sha64(cb, y.to_bytes(32, "little"))
            if proof_target is not None and not self.passes_target(solution_id, proof_target):
                continue
            out.append(PuzzleSolutionData(
                commitment=cb, eval_y=y, witness=w_bytes,
                solution_id=solution_id))
        return out

    def _challenge(self, c_bytes: bytes) -> int:
        cx = int.from_bytes(c_bytes[:48], "little") % R
        return ref_poseidon.hash1([cx], rate=2, domain=CHALLENGE_DOMAIN)

    @staticmethod
    def passes_target(solution_id: int, proof_target: int) -> bool:
        return solution_id <= (1 << 64) // max(proof_target, 1)

    # -- verification --------------------------------------------------------
    def check_binding(self, epoch_hash: bytes, address: str, nonce: int,
                      commitment: bytes, eval_y: int) -> bool:
        """The epoch-relation binding: re-derive the coefficients for
        (epoch_hash, address, nonce) through the EPOCH PROGRAM and check
        eval_y == p(z) at the Fiat-Shamir challenge z(C). Combined with the
        pairing check (which proves the COMMITTED polynomial opens to
        eval_y at z, with z sampled after C), this forces the committed
        polynomial to equal the epoch-derived one whp — a proof computed
        against a previous epoch's relation, another address, or a
        hand-picked cheap polynomial is rejected here. Device cost: one
        Poseidon batch + the epoch program + a dot product (no MSM)."""
        from snarkos_tpu.ops import kzg as kzg_ops

        seed = self._seed_field(epoch_hash, address, nonce)
        coeffs_mont = self._coeffs_device(epoch_hash, seed)
        z = self._challenge(commitment)
        return kzg_ops.poly_eval(coeffs_mont, z) == eval_y % R

    def verify(self, epoch_hash: bytes, address: str, nonce: int,
               commitment: bytes, eval_y: int, witness: bytes,
               proof_target: int) -> bool:
        """Asymmetric check: target + epoch-program binding + pairing."""
        opening = self.check_structural(commitment, eval_y, witness, proof_target)
        if opening is None:
            return False
        if not self.check_binding(epoch_hash, address, nonce, commitment, eval_y):
            return False
        c_pt, z, y, w_pt = opening
        return ref_kzg.verify(self.srs.srs_ref, c_pt, z, y, w_pt)

    def check_structural(self, commitment: bytes, eval_y: int, witness: bytes,
                         proof_target: int):
        """Everything except the pairing equation: decoding, canonicality,
        target. Returns the (C, z, y, W) opening for (batch) pairing
        verification, or None if structurally invalid."""
        try:
            c_pt = _g1_from_bytes(commitment)
            w_pt = _g1_from_bytes(witness)
        except ValueError:
            return None
        if not (0 <= eval_y < R):
            return None
        solution_id = sha64(commitment, eval_y.to_bytes(32, "little"))
        if not self.passes_target(solution_id, proof_target):
            return None
        z = self._challenge(commitment)
        return (c_pt, z, eval_y, w_pt)

    def verify_batch(self, items) -> bool:
        """Verify many solutions with TWO pairings total (all-or-nothing).

        items: iterable of (epoch_hash, address, nonce, commitment, eval_y,
        witness, proof_target). The per-solution structural + epoch-binding
        checks run individually; the pairing equations collapse into one
        random-linear-combination batch (ops/kzg.batch_verify — device MSM
        for the point side). The reference verifies each gossiped solution
        separately on CPU (ledger-service/src/ledger.rs:306-315); batching
        is the TPU-native block-rate win. Callers fall back to verify() to
        isolate offenders.
        """
        from snarkos_tpu.ops import kzg as kzg_ops

        openings = []
        for epoch_hash, address, nonce, commitment, eval_y, witness, proof_target in items:
            opening = self.check_structural(commitment, eval_y, witness, proof_target)
            if opening is None:
                return False
            if not self.check_binding(epoch_hash, address, nonce, commitment, eval_y):
                return False
            openings.append(opening)
        if not openings:
            return True
        if len(openings) == 1:
            c_pt, z, y, w_pt = openings[0]
            return ref_kzg.verify(self.srs.srs_ref, c_pt, z, y, w_pt)
        return kzg_ops.batch_verify(self.srs.srs_ref, openings)


def _slice_points(points: "g1ops.JacobianPoints", n: int) -> "g1ops.JacobianPoints":
    return g1ops.JacobianPoints(points.x[:, :n], points.y[:, :n], points.z[:, :n])


_PUZZLE: Puzzle | None = None


def global_puzzle(log_degree: int | None = None) -> Puzzle:
    """Process-wide puzzle instance (SRS loaded once)."""
    global _PUZZLE
    want = log_degree if log_degree is not None else (
        _PUZZLE.log_degree if _PUZZLE else int(os.environ.get("SNARKOS_TPU_PUZZLE_LOG_DEGREE", DEFAULT_LOG_DEGREE))
    )
    if _PUZZLE is None or _PUZZLE.log_degree != want:
        _PUZZLE = Puzzle(want)
    return _PUZZLE
