"""Varuna-style AHP zkSNARK over KZG (host reference implementation).

The reference node verifies a full Varuna (Marlin-family) proof inside
snarkVM on every gossiped transaction
(/root/reference/node/bft/ledger-service/src/ledger.rs:318-343). This
module implements that capability for the new framework: a Marlin-style
algebraic holographic proof for R1CS over the BLS12-377 KZG commitment
scheme with a Poseidon-sponge Fiat-Shamir transcript:

  round 1  commit w_hat, z_A, z_B, z_C            -> alpha, eta_A/B/C
  round 2  commit h_0 (rowcheck quotient),
           g_1, h_1 (univariate sumcheck pieces)  -> beta
  openings all 7 polynomials at beta              -> xi
  batch    single KZG witness for the xi-combined opening (2 pairings)

Checked identities (at beta):
  rowcheck   z_A z_B - z_C = h_0 * v_H
  lincheck   r(alpha,beta) * sum_M eta_M z_M(beta)
               - (sum_M eta_M r_M(alpha,beta)) * z(beta)
               = h_1(beta) v_H(beta) + beta g_1(beta)
  input      z(beta) = w_hat(beta) * v_I(beta) + x_hat(beta)

Documented deltas vs full Varuna (capability-preserving simplifications,
not parity bugs): the verifier evaluates the matrix polynomials
r_M(alpha, beta) directly in O(nnz) host time instead of running the
third (holographic matrix) sumcheck; commitments are non-hiding (no zk
blinding); g_1's degree bound (<= n-2) is not enforced with a shifted
commitment. The prover's hot paths (NTTs, MSM commits, Poseidon
transcript) are the [HOT] kernel families of ops/ (ops/ntt.py,
ops/msm.py, ops/poseidon.py); ``prove(commit_fn=...)`` accepts an
accelerated MSM for the commitment side.
"""

from __future__ import annotations

from dataclasses import dataclass

from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import g1, kzg, ntt, poseidon
from snarkos_tpu.crypto.ref.r1cs import R1CS

R = params.FR_MODULUS

FS_DOMAIN = "snarkos_tpu.varuna.fs"


# --------------------------------------------------------------------------
# polynomial helpers (coefficient vectors, low-order first)
# --------------------------------------------------------------------------


def _interp(evals: list[int]) -> list[int]:
    """Coefficients of the degree-<n interpolation over H (iNTT)."""
    return ntt.ntt(list(evals), invert=True)


def _eval_domain(coeffs: list[int], size: int) -> list[int]:
    """Evaluations over the size-``size`` subgroup (zero-padded NTT)."""
    return ntt.ntt(list(coeffs) + [0] * (size - len(coeffs)))


def _poly_mul(a: list[int], b: list[int]) -> list[int]:
    n = 1
    while n < len(a) + len(b) - 1:
        n *= 2
    fa = _eval_domain(a, n)
    fb = _eval_domain(b, n)
    return ntt.ntt([x * y % R for x, y in zip(fa, fb)], invert=True)[: len(a) + len(b) - 1]


def _divmod_vanishing(p: list[int], n: int) -> tuple[list[int], list[int]]:
    """Divide p by v = X^n - 1: (quotient, remainder). deg p < 2n req'd not."""
    p = list(p)
    q = [0] * max(0, len(p) - n)
    for i in range(len(p) - 1, n - 1, -1):
        c = p[i] % R
        if c:
            q[i - n] = c
            p[i] = 0
            p[i - n] = (p[i - n] + c) % R
    return q, [x % R for x in p[:n]]


def _batch_inverse(xs: list[int]) -> list[int]:
    """Montgomery batch inversion: one pow, 3(n-1) muls."""
    prefix = [1] * (len(xs) + 1)
    for i, x in enumerate(xs):
        prefix[i + 1] = prefix[i] * x % R
    inv = pow(prefix[-1], -1, R)
    out = [0] * len(xs)
    for i in range(len(xs) - 1, -1, -1):
        out[i] = prefix[i] * inv % R
        inv = inv * xs[i] % R
    return out


def _div_vanishing_exact(p: list[int], n: int) -> list[int]:
    q, rem = _divmod_vanishing(p, n)
    assert all(x == 0 for x in rem), "not divisible by v_H"
    return q


# --------------------------------------------------------------------------
# Fiat-Shamir transcript (Poseidon sponge)
# --------------------------------------------------------------------------


class Transcript:
    """Poseidon-sponge transcript; commitments absorbed as affine coords."""

    def __init__(self):
        self.items: list[int] = []

    def absorb_field(self, x: int) -> None:
        self.items.append(x % R)

    def absorb_point(self, p) -> None:
        a = g1.affine(p)
        if a is None:
            self.items.extend([0, 0, 1])
        else:
            # Fq coords folded into Fr by split absorption (lo/hi 192 bits):
            # collision-free injection of the 377-bit coordinate
            for c in a:
                self.items.append(c & ((1 << 192) - 1))
                self.items.append(c >> 192)
            self.items.append(0)

    def challenge(self, label: str) -> int:
        out = poseidon.hash1(
            self.items + [poseidon._domain_to_field(label)], rate=2, domain=FS_DOMAIN
        )
        self.items.append(out)
        return out


# --------------------------------------------------------------------------
# the proof system
# --------------------------------------------------------------------------


@dataclass
class VarunaProof:
    commitments: list  # [c_w, c_zA, c_zB, c_zC, c_h0, c_g1, c_h1] Jacobian
    evals: list[int]  # values of the same 7 polynomials at beta
    batch_witness: tuple  # single KZG witness at beta

    def serialize(self) -> bytes:
        from snarkos_tpu.node.codec import Writer

        w = Writer()
        for c in self.commitments:
            _write_point(w, c)
        for y in self.evals:
            w.field(y)
        _write_point(w, self.batch_witness)
        return w.out()

    @classmethod
    def deserialize(cls, data: bytes) -> "VarunaProof":
        from snarkos_tpu.node.codec import Reader

        r = Reader(data)
        commitments = [_read_point(r) for _ in range(7)]
        evals = [r.field() for _ in range(7)]
        witness = _read_point(r)
        return cls(commitments, evals, witness)


def _write_point(w, p) -> None:
    a = g1.affine(p)
    if a is None:
        w.raw(bytes(48) + bytes(48) + b"\x01")
    else:
        w.raw(a[0].to_bytes(48, "little") + a[1].to_bytes(48, "little") + b"\x00")


def _read_point(r):
    x = int.from_bytes(r.take(48), "little")
    y = int.from_bytes(r.take(48), "little")
    inf = r.take(1)[0]
    if inf:
        return g1.INFINITY
    if x >= params.FQ_MODULUS or y >= params.FQ_MODULUS:
        raise ValueError("non-canonical G1 coordinate")
    pt = g1.from_affine((x, y))
    if not g1.on_curve(pt):
        raise ValueError("point not on curve")
    return pt


def _x_hat_coeffs(cs: R1CS, public: list[int]) -> list[int]:
    """Interpolation of the public inputs over I (size l, root omega^(n/l))."""
    l = cs.num_public
    # iNTT over the size-l subgroup
    coeffs = ntt.ntt(list(public), invert=True) if l > 1 else list(public)
    return coeffs


def _domain(n: int) -> list[int]:
    w = ntt.root_of_unity(n)
    out = [1] * n
    for i in range(1, n):
        out[i] = out[i - 1] * w % R
    return out


def prove(srs: kzg.SRS, cs: R1CS, z: list[int], commit_fn=None) -> VarunaProof:
    """AHP prover. z: full assignment over H (satisfying). commit_fn:
    optional accelerated MSM (coeffs -> point); defaults to host kzg."""
    n = cs.n
    l = cs.num_public
    commit = commit_fn or (lambda coeffs: kzg.commit(srs, coeffs))
    public = [z[cs.public(i)] for i in range(l)]

    # round 1: witness + masked matrix polynomials
    x_hat = _x_hat_coeffs(cs, public)
    z_hat = _interp(z)
    # w_hat = (z_hat - x_hat) / v_I, exact by construction
    diff = [(a - (x_hat[i] if i < len(x_hat) else 0)) % R for i, a in enumerate(z_hat)]
    w_hat = _div_vanishing_exact(diff, l)
    za_e = cs.matvec(cs.rows_a, z)
    zb_e = cs.matvec(cs.rows_b, z)
    zc_e = cs.matvec(cs.rows_c, z)
    za, zb, zc = _interp(za_e), _interp(zb_e), _interp(zc_e)

    tr = Transcript()
    c_w, c_za, c_zb, c_zc = commit(w_hat), commit(za), commit(zb), commit(zc)
    for c in (c_w, c_za, c_zb, c_zc):
        tr.absorb_point(c)
    alpha = tr.challenge("alpha")
    etas = [tr.challenge("eta_a"), tr.challenge("eta_b"), tr.challenge("eta_c")]

    # round 2a: rowcheck quotient h_0 = (z_A z_B - z_C) / v_H
    prod = _poly_mul(za, zb)
    num = [(prod[i] if i < len(prod) else 0) - (zc[i] if i < len(zc) else 0)
           for i in range(max(len(prod), len(zc)))]
    h0 = _div_vanishing_exact([x % R for x in num], n)

    # round 2b: univariate sumcheck for the lincheck
    # r(alpha, X) = sum_i alpha^(n-1-i) X^i  (coeffs: powers of alpha reversed)
    apow = [1] * n
    for i in range(1, n):
        apow[i] = apow[i - 1] * alpha % R
    r_alpha = apow[::-1]
    # r_M(alpha, .) evals over H: (r^T M)_j with r_i = r(alpha, omega^i)
    dom = _domain(n)
    r_vec = [ntt.poly_eval(r_alpha, w) for w in dom]
    rm_evals = [0] * n
    for eta, rows in zip(etas, (cs.rows_a, cs.rows_b, cs.rows_c)):
        for i, lc in enumerate(rows):
            ri = r_vec[i] * eta % R
            if ri:
                for j, v in lc.items():
                    rm_evals[j] = (rm_evals[j] + ri * v) % R
    rm = _interp(rm_evals)
    # q_1 = r(alpha,X) * (sum eta_M z_M) - rm(X) * z_hat(X)
    zsum = [(etas[0] * za[i] + etas[1] * zb[i] + etas[2] * zc[i]) % R for i in range(n)]
    q1a = _poly_mul(r_alpha, zsum)
    q1b = _poly_mul(rm, z_hat)
    q1 = [((q1a[i] if i < len(q1a) else 0) - (q1b[i] if i < len(q1b) else 0)) % R
          for i in range(max(len(q1a), len(q1b)))]
    h1, rem = _divmod_vanishing(q1, n)
    assert rem[0] == 0, "sumcheck constant term nonzero (unsatisfied system?)"
    g1_poly = rem[1:]

    c_h0, c_g1, c_h1 = commit(h0), commit(g1_poly), commit(h1)
    for c in (c_h0, c_g1, c_h1):
        tr.absorb_point(c)
    beta = tr.challenge("beta")

    # openings at beta
    polys = [w_hat, za, zb, zc, h0, g1_poly, h1]
    evals = [ntt.poly_eval(p, beta) for p in polys]
    for y in evals:
        tr.absorb_field(y)
    xi = tr.challenge("xi")

    # batch witness: single opening of P = sum xi^i p_i at beta
    maxlen = max(len(p) for p in polys)
    combined = [0] * maxlen
    coeff = 1
    for p in polys:
        for i, c in enumerate(p):
            combined[i] = (combined[i] + coeff * c) % R
        coeff = coeff * xi % R
    _, witness = _kzg_open(srs, combined, beta, commit)
    return VarunaProof([c_w, c_za, c_zb, c_zc, c_h0, c_g1, c_h1], evals, witness)


def _kzg_open(srs, coeffs, zpt, commit):
    y = ntt.poly_eval(coeffs, zpt)
    q = [0] * (len(coeffs) - 1)
    carry = 0
    for i in range(len(coeffs) - 1, 0, -1):
        carry = (coeffs[i] + carry * zpt) % R
        q[i - 1] = carry
    return y, (commit(q) if q else g1.INFINITY)


def verify(srs: kzg.SRS, cs: R1CS, public: list[int], proof: VarunaProof,
           pairing_check=None) -> bool:
    """AHP verifier: recompute transcript, check the two polynomial
    identities at beta, batch-verify the single KZG opening (2 pairings)."""
    opening = verify_prepare(cs, public, proof)
    if opening is None:
        return False
    c_p, beta, y_p, witness = opening
    check = pairing_check or kzg.verify
    return check(srs, c_p, beta, y_p, witness)


def verify_prepare(cs: R1CS, public: list[int], proof: VarunaProof):
    """All pairing-free verifier work: transcript recomputation + the
    rowcheck/lincheck identities at beta. Returns the final (C, z, y, W)
    KZG opening for (batched) pairing verification, or None if any check
    fails. Lets the block path batch ALL transmissions' pairings into one
    multi-pairing (ops/kzg.batch_verify), like the puzzle path."""
    n = cs.n
    l = cs.num_public
    if len(proof.commitments) != 7 or len(proof.evals) != 7:
        return None
    tr = Transcript()
    for c in proof.commitments[:4]:
        tr.absorb_point(c)
    alpha = tr.challenge("alpha")
    etas = [tr.challenge("eta_a"), tr.challenge("eta_b"), tr.challenge("eta_c")]
    for c in proof.commitments[4:]:
        tr.absorb_point(c)
    beta = tr.challenge("beta")
    for y in proof.evals:
        tr.absorb_field(y)
    xi = tr.challenge("xi")

    y_w, y_za, y_zb, y_zc, y_h0, y_g1, y_h1 = [y % R for y in proof.evals]
    v_h_beta = (pow(beta, n, R) - 1) % R
    v_i_beta = (pow(beta, l, R) - 1) % R
    # x_hat(beta) via iNTT coefficients of the public inputs (O(l))
    x_hat = _x_hat_coeffs(cs, [p % R for p in public])
    x_beta = ntt.poly_eval(x_hat, beta)
    z_beta = (y_w * v_i_beta + x_beta) % R

    # rowcheck at beta
    if (y_za * y_zb - y_zc) % R != y_h0 * v_h_beta % R:
        return None

    # lincheck at beta. r(alpha,beta) = (v_H(alpha)-v_H(beta))/(alpha-beta)
    if alpha == beta:
        return None
    v_h_alpha = (pow(alpha, n, R) - 1) % R
    r_ab = (v_h_alpha - v_h_beta) * pow(alpha - beta, -1, R) % R
    # r_M(alpha,beta) = sum_{(i,j,v) in M} r(alpha, omega^i) * v * L_j(beta)
    # (direct O(nnz) evaluation — the non-holographic verifier delta)
    dom = _domain(n)
    n_inv = pow(n, -1, R)
    # r(alpha, omega^i) = v_H(alpha) / (alpha - omega^i)
    # L_j(beta) = v_H(beta) * omega^j / (n (beta - omega^j))
    inv_a = _batch_inverse([(alpha - w) % R for w in dom])
    inv_b = _batch_inverse([(beta - w) % R for w in dom])
    r_at = [v_h_alpha * iv % R for iv in inv_a]
    l_at = [v_h_beta * w % R * iv % R * n_inv % R for w, iv in zip(dom, inv_b)]
    rm_ab = 0
    for eta, rows in zip(etas, (cs.rows_a, cs.rows_b, cs.rows_c)):
        acc = 0
        for i, lc in enumerate(rows):
            ri = r_at[i]
            s = 0
            for j, v in lc.items():
                s = (s + v * l_at[j]) % R
            acc = (acc + ri * s) % R
        rm_ab = (rm_ab + eta * acc) % R
    zsum_beta = (etas[0] * y_za + etas[1] * y_zb + etas[2] * y_zc) % R
    lhs = (r_ab * zsum_beta - rm_ab * z_beta) % R
    rhs = (y_h1 * v_h_beta + beta * y_g1) % R
    if lhs != rhs:
        return None

    # xi-combined opening: C_P = sum xi^i C_i, y_P = sum xi^i y_i
    from snarkos_tpu.utils import native

    coeffs = []
    y_p = 0
    coeff = 1
    for y in proof.evals:
        coeffs.append(coeff)
        y_p = (y_p + coeff * y) % R
        coeff = coeff * xi % R
    c_p = None
    if native.have_g1():
        pairs = [(k, g1.affine(c)) for k, c in zip(coeffs, proof.commitments)]
        pairs = [(k, a) for k, a in pairs if a is not None]  # identity adds 0
        if pairs:
            c_p = native.g1_msm([k for k, _ in pairs], [a for _, a in pairs])
        else:
            c_p = g1.INFINITY
    if c_p is None:
        c_p = g1.INFINITY
        for k, c in zip(coeffs, proof.commitments):
            c_p = g1.add(c_p, g1.scalar_mul(k, c))
    return (c_p, beta, y_p, proof.batch_witness)
