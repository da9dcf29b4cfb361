"""KZG polynomial commitment on TPU (BASELINE config #4/#5; Varuna PC).

The reference reaches KZG through snarkVM's Varuna verifier on every
gossiped transaction and through the puzzle's commit/open pipeline
(SURVEY.md §2.10 "Transaction verify", ledger-service/src/ledger.rs:319-342).
There the polynomial work runs on rayon CPU threads; here every scalar-
side step is a data-parallel device computation and only the final two
pairings run on host (crypto/ref/pairing.py), per BASELINE.md.

TPU-first redesign of the open path
-----------------------------------
The textbook opening algorithm is synthetic division — an inherently
*serial* recurrence q_i = c_{i+1} + z * q_{i+1} (crypto/ref/kzg.py:51-63).
A length-n serial loop of tiny field ops is the worst possible TPU shape,
so the quotient is reformulated in closed form:

    t_j = c_j * z^j                  (pointwise, one mont_mul)
    S_i = sum_{j >= i} t_j           (suffix sums: log2(n) shifted adds)
    p(z) = S_0
    q_i  = S_{i+1} * z^{-(i+1)}      (pointwise mont_mul by z^{-1} powers)

which is exact in the field (no rounding concerns) and turns the open
into O(log n) full-width vector passes + one power table — the same
geometric_powers doubling ladder the NTT twiddle builder uses. The z = 0
corner (probability ~2^-253 under Fiat-Shamir) falls back to the trivial
shift q_i = c_{i+1}.

commit/open witnesses are Pippenger MSMs (ops/msm.py); batch_verify
collapses a whole batch of openings into TWO pairings via a random
linear combination whose point side is a single device MSM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import g1 as ref_g1, pairing
from snarkos_tpu.ops import g1 as g1ops
from snarkos_tpu.ops import modarith as fa
from snarkos_tpu.ops import msm as msm_mod
from snarkos_tpu.ops.fieldspec import FR
from snarkos_tpu.ops.ntt import geometric_powers

R = params.FR_MODULUS


# ---------------------------------------------------------------------------
# device building blocks
# ---------------------------------------------------------------------------


def _suffix_sums(t: jax.Array) -> jax.Array:
    """(L, n) -> (L, n) suffix sums S_i = sum_{j>=i} t_j via Hillis-Steele:
    log2(n) full-width shifted adds. One fori_loop with a dynamic roll so
    the add graph is traced exactly once (compile economy)."""
    n = t.shape[-1]
    idx = jnp.arange(n)[None, :]
    steps = max(n - 1, 1).bit_length()

    def body(i, cur):
        d = jnp.int32(1) << i
        shifted = jnp.where(idx >= n - d, 0, jnp.roll(cur, -d, axis=-1))
        return fa.add_impl(FR, cur, shifted)

    return jax.lax.fori_loop(0, steps, body, t)


def _eval_quotient_device(coeffs_mont: jax.Array, z_mont: jax.Array,
                          zinv_mont: jax.Array):
    """Shared device core: -> (y (L,1) Montgomery, q (L,n) Montgomery).

    q is the synthetic-division quotient padded with a zero top
    coefficient so its MSM shape matches the commit MSM.
    """
    n = coeffs_mont.shape[-1]
    z_pows = geometric_powers(z_mont, n)          # (L, n): 1, z, ..., z^{n-1}
    t = fa.mont_mul_impl(FR, coeffs_mont, z_pows)  # c_j z^j
    s = _suffix_sums(t)
    y = s[:, :1]
    # q_i = S_{i+1} * z^{-(i+1)}, i = 0..n-2; pad q_{n-1} = 0
    zinv_pows = geometric_powers(zinv_mont, n)     # 1, z^-1, ..., z^-(n-1)
    s_next = jnp.concatenate([s[:, 1:], jnp.zeros((s.shape[0], 1), s.dtype)], axis=-1)
    zinv_shift = fa.mont_mul_impl(FR, zinv_pows, zinv_mont)  # z^-(i+1)
    q = fa.mont_mul_impl(FR, s_next, zinv_shift)
    return y, q


_eval_quotient_jit = jax.jit(_eval_quotient_device)


def eval_and_quotient(coeffs_mont: jax.Array, z: int):
    """(L, n) Montgomery coefficients, host scalar z ->
    (y = p(z) as host int, quotient (L, n) Montgomery, zero-padded top).
    """
    z %= R
    if z == 0:
        # q = coeffs >> 1 (q_i = c_{i+1}); y = c_0
        q = jnp.concatenate(
            [coeffs_mont[:, 1:], jnp.zeros((coeffs_mont.shape[0], 1), coeffs_mont.dtype)],
            axis=-1,
        )
        y = FR.decode_fast(np.asarray(coeffs_mont[:, :1]), mont=True)[0]
        return y, q
    z_mont = jnp.array(FR.encode_fast([z], mont=True))
    zinv_mont = jnp.array(FR.encode_fast([pow(z, -1, R)], mont=True))
    y, q = _eval_quotient_jit(coeffs_mont, z_mont, zinv_mont)
    return FR.decode_fast(np.asarray(y), mont=True)[0], q


_eval_quotient_multi_jit = jax.jit(
    jax.vmap(_eval_quotient_device, in_axes=(1, 1, 1), out_axes=(1, 1)))


def eval_and_quotient_multi(coeffs_mont: jax.Array, zs: list):
    """Batched eval+quotient: (L, B, n) Montgomery coefficient batch and
    B host points -> (ys host ints, quotients (L, B, n) Montgomery).
    ONE device dispatch for the whole batch (the puzzle prover's shape;
    per-nonce eval calls paid a host sync each)."""
    zs = [z % R for z in zs]
    if any(z == 0 for z in zs):  # ~2^-253 corner: per-item fallback
        outs = [eval_and_quotient(coeffs_mont[:, i], z)
                for i, z in enumerate(zs)]
        return [y for y, _ in outs], jnp.stack([q for _, q in outs], axis=1)
    z_mont = jnp.asarray(np.asarray(FR.encode_fast(zs, mont=True))[:, :, None])
    zinv_mont = jnp.asarray(
        np.asarray(FR.encode_fast([pow(z, -1, R) for z in zs], mont=True))[:, :, None])
    y, q = _eval_quotient_multi_jit(coeffs_mont, z_mont, zinv_mont)
    ys = FR.decode_fast(np.asarray(y[:, :, 0]), mont=True)
    return list(ys), q


def poly_eval(coeffs_mont: jax.Array, z: int) -> int:
    """p(z) for host z over device coefficients (parallel dot with the
    geometric power table; used by tests and transcript checks)."""
    y, _ = eval_and_quotient(coeffs_mont, z)
    return y


# ---------------------------------------------------------------------------
# commit / open / verify
# ---------------------------------------------------------------------------


def commit(points: "g1ops.JacobianPoints", coeffs_mont: jax.Array,
           use_pallas: bool | None = None) -> "g1ops.JacobianPoints":
    """KZG commit = MSM(coeffs, SRS powers). points: (L, >=n) device SRS;
    coeffs: (L, n) Montgomery Fr. Returns a 1-point batch."""
    n = coeffs_mont.shape[-1]
    pts = g1ops.JacobianPoints(points.x[:, :n], points.y[:, :n], points.z[:, :n])
    scalars = fa.from_mont(FR, coeffs_mont)
    return msm_mod.msm(pts, scalars, use_pallas=use_pallas)


def open_at(points: "g1ops.JacobianPoints", coeffs_mont: jax.Array, z: int,
            use_pallas: bool | None = None):
    """-> (y = p(z) host int, witness point (1-batch JacobianPoints)).

    witness = commit((p - y) / (X - z)); the quotient is built fully on
    device (see module docstring) — no host serial division.
    """
    y, q = eval_and_quotient(coeffs_mont, z)
    witness = commit(points, q, use_pallas=use_pallas)
    return y, witness


def verify(srs_ref, commitment, z: int, y: int, witness) -> bool:
    """Single-opening pairing check on host (2 pairings); commitment and
    witness are reference Jacobian tuples. e(C - yG, H) == e(W, tauH - zH).
    """
    from snarkos_tpu.crypto.ref import kzg as ref_kzg

    return ref_kzg.verify(srs_ref, commitment, z, y, witness)


def batch_verify(srs_ref, openings, gamma: int | None = None,
                 use_pallas: bool | None = None) -> bool:
    """Batch-verify [(C_i, z_i, y_i, W_i)] with TWO pairings total.

    Random linear combination (crypto/ref/kzg.py:79-100 semantics):
        e(sum_i γ^i (C_i - y_i G + z_i W_i), H) * e(-sum_i γ^i W_i, τH) == 1
    The point side is ONE device MSM over [C_0..C_b, W_0..W_b, G] with
    scalars [γ^i, γ^i z_i, -Σ γ^i y_i] plus a b-point MSM for the W
    accumulator; only the two pairings run on host.
    """
    if not openings:
        return True
    if gamma is None:
        gamma = pow(5, 8, R)  # matches ref batch_verify(rng_seed=1)
    b = len(openings)
    coeffs = []
    acc = 1
    for _ in range(b):
        coeffs.append(acc)
        acc = acc * gamma % R
    c_pts = [o[0] for o in openings]
    w_pts = [o[3] for o in openings]
    zs = [o[1] % R for o in openings]
    ys = [o[2] % R for o in openings]
    neg_y_sum = (-sum(c * y for c, y in zip(coeffs, ys))) % R

    def _padded_msm(pts, scalars):
        # pad to the next power of two with zero-scalar generator lanes so
        # MSM shapes fall into few classes (every distinct width would
        # otherwise compile a fresh program — ~6 min per shape on TPU)
        m = 1 << max(3, (len(pts) - 1).bit_length())
        pts = pts + [ref_g1.GENERATOR] * (m - len(pts))
        scalars = scalars + [0] * (m - len(scalars))
        return msm_mod.msm(
            g1ops.encode_points(pts), jnp.array(FR.encode_fast(scalars)),
            use_pallas=use_pallas,
        )

    acc_left = _padded_msm(
        c_pts + w_pts + [ref_g1.GENERATOR],
        coeffs + [c * z % R for c, z in zip(coeffs, zs)] + [neg_y_sum],
    )
    acc_w = _padded_msm(w_pts, list(coeffs))
    left_jac = g1ops.decode_points(acc_left)[0]
    w_jac = g1ops.decode_points(acc_w)[0]
    return pairing.pairing_check(
        [
            (ref_g1.affine(left_jac), srs_ref.h),
            (ref_g1.affine(ref_g1.neg(w_jac)), srs_ref.tau_h),
        ]
    )
