"""Batched BLS12-377 G1 arithmetic on limb tensors.

Points are Jacobian (X, Y, Z) with each coordinate an ``(L, *batch)``
Montgomery limb array (see ops/modarith.py); the identity is Z == 0 with
X = Y = 1 (Montgomery one), matching crypto/ref/g1.py bit-for-bit.

The addition law is made *complete* branchlessly: the generic
add-2007-bl formulas are computed unconditionally, and per-lane selects
patch the special cases (either operand at infinity, P == Q doubling,
P == -Q infinity). This is the shape SIMD hardware wants — the reference
runs the same formulas with scalar branches inside snarkVM's Rust
(SURVEY.md §2.10), which would serialize TPU lanes.

``*_impl`` functions are pure (safe inside Pallas kernels / traced
contexts); the public names are jitted wrappers. The MSM hot path uses
the fused Pallas kernel in ops/g1_pallas.py instead, which wraps
``add_impl`` in a single custom call to keep XLA graphs small and
intermediates in VMEM.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from snarkos_tpu.crypto import params
from snarkos_tpu.ops import modarith as fa
from snarkos_tpu.ops.fieldspec import FQ


@dataclass
class JacobianPoints:
    """A batch of Jacobian points; coordinates are (L, *batch) int32."""

    x: jax.Array
    y: jax.Array
    z: jax.Array

    @property
    def batch_shape(self):
        return self.x.shape[1:]

    def tree_flatten(self):
        return (self.x, self.y, self.z), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    JacobianPoints, JacobianPoints.tree_flatten, JacobianPoints.tree_unflatten
)


def infinity(batch_shape) -> JacobianPoints:
    one = fa.broadcast_const(FQ, 1, batch_shape)
    return JacobianPoints(x=one, y=one, z=jnp.zeros_like(one))


def is_infinity_impl(p: JacobianPoints) -> jax.Array:
    return fa.is_zero_impl(FQ, p.z)


def _select(mask, a: jax.Array, b: jax.Array) -> jax.Array:
    """mask (batch,) -> choose a where True else b, over (L, *batch)."""
    return jnp.where(mask[None], a, b)


def select_points(mask, a: JacobianPoints, b: JacobianPoints) -> JacobianPoints:
    return JacobianPoints(
        x=_select(mask, a.x, b.x), y=_select(mask, a.y, b.y), z=_select(mask, a.z, b.z)
    )


def double_impl(p: JacobianPoints) -> JacobianPoints:
    """dbl-2009-l (a = 0). Handles the identity for free (Z in, Z out = 0)."""
    A = fa.mont_sqr_impl(FQ, p.x)
    B = fa.mont_sqr_impl(FQ, p.y)
    C = fa.mont_sqr_impl(FQ, B)
    xb = fa.add_impl(FQ, p.x, B)
    D = fa.sub_impl(FQ, fa.sub_impl(FQ, fa.mont_sqr_impl(FQ, xb), A), C)
    D = fa.double_impl(FQ, D)
    E = fa.mul_small_impl(FQ, A, 3)
    F = fa.mont_sqr_impl(FQ, E)
    x3 = fa.sub_impl(FQ, F, fa.double_impl(FQ, D))
    y3 = fa.sub_impl(
        FQ, fa.mont_mul_impl(FQ, E, fa.sub_impl(FQ, D, x3)), fa.mul_small_impl(FQ, C, 8)
    )
    z3 = fa.double_impl(FQ, fa.mont_mul_impl(FQ, p.y, p.z))
    return JacobianPoints(x=x3, y=y3, z=z3)


def add_impl(p: JacobianPoints, q: JacobianPoints) -> JacobianPoints:
    """Complete branchless Jacobian addition (add-2007-bl + selects)."""
    z1z1 = fa.mont_sqr_impl(FQ, p.z)
    z2z2 = fa.mont_sqr_impl(FQ, q.z)
    u1 = fa.mont_mul_impl(FQ, p.x, z2z2)
    u2 = fa.mont_mul_impl(FQ, q.x, z1z1)
    s1 = fa.mont_mul_impl(FQ, fa.mont_mul_impl(FQ, p.y, q.z), z2z2)
    s2 = fa.mont_mul_impl(FQ, fa.mont_mul_impl(FQ, q.y, p.z), z1z1)

    h = fa.sub_impl(FQ, u2, u1)
    rr = fa.double_impl(FQ, fa.sub_impl(FQ, s2, s1))

    i = fa.mont_sqr_impl(FQ, fa.double_impl(FQ, h))
    j = fa.mont_mul_impl(FQ, h, i)
    v = fa.mont_mul_impl(FQ, u1, i)
    x3 = fa.sub_impl(
        FQ, fa.sub_impl(FQ, fa.mont_sqr_impl(FQ, rr), j), fa.double_impl(FQ, v)
    )
    y3 = fa.sub_impl(
        FQ,
        fa.mont_mul_impl(FQ, rr, fa.sub_impl(FQ, v, x3)),
        fa.double_impl(FQ, fa.mont_mul_impl(FQ, s1, j)),
    )
    zz = fa.sub_impl(
        FQ,
        fa.sub_impl(FQ, fa.mont_sqr_impl(FQ, fa.add_impl(FQ, p.z, q.z)), z1z1),
        z2z2,
    )
    z3 = fa.mont_mul_impl(FQ, zz, h)
    generic = JacobianPoints(x=x3, y=y3, z=z3)

    # special cases
    p_inf = is_infinity_impl(p)
    q_inf = is_infinity_impl(q)
    x_eq = fa.eq_impl(FQ, u1, u2)
    y_eq = fa.eq_impl(FQ, s1, s2)
    both_finite = jnp.logical_and(~p_inf, ~q_inf)
    is_dbl = jnp.logical_and(both_finite, jnp.logical_and(x_eq, y_eq))
    is_neg = jnp.logical_and(both_finite, jnp.logical_and(x_eq, ~y_eq))

    out = generic
    out = select_points(is_dbl, double_impl(p), out)
    # P == -Q: force Z = 0 (the identity is "Z == 0 with any X, Y" — only
    # Z is inspected downstream; avoids materializing a constant array,
    # which Pallas kernels cannot capture).
    out = JacobianPoints(out.x, out.y, jnp.where(is_neg[None], 0, out.z))
    out = select_points(q_inf, p, out)
    out = select_points(p_inf, q, out)
    return out


def madd_impl(p: JacobianPoints, qx: jax.Array, qy: jax.Array,
              one: jax.Array | None = None) -> JacobianPoints:
    """Complete branchless MIXED addition: Jacobian p + affine (qx, qy).

    madd-2007-bl (7M+4S) with the doubling branch computed from the
    affine operand (p == q as group elements implies the sum is 2*(qx,qy),
    so the a=0 affine doubling at 1M+5S suffices) — ~17 Fq muls total vs
    ~23 for the complete Jacobian-Jacobian ``add_impl``. This is the MSM
    bucket-scan hot combine (ops/msm_pallas.py); the affine operand MUST
    be a real curve point (never the identity) — bucket inputs are
    original MSM points, which satisfy this by construction.

    ``one`` optionally supplies a Montgomery-one array of qx's shape so
    Pallas kernel bodies don't materialize a nontrivial constant.
    """
    if one is None:
        one = fa.broadcast_const(FQ, 1, qx.shape[1:])
    z1z1 = fa.mont_sqr_impl(FQ, p.z)
    u2 = fa.mont_mul_impl(FQ, qx, z1z1)
    s2 = fa.mont_mul_impl(FQ, qy, fa.mont_mul_impl(FQ, p.z, z1z1))
    h = fa.sub_impl(FQ, u2, p.x)
    rr = fa.double_impl(FQ, fa.sub_impl(FQ, s2, p.y))
    hh = fa.mont_sqr_impl(FQ, h)
    i = fa.mul_small_impl(FQ, hh, 4)
    j = fa.mont_mul_impl(FQ, h, i)
    v = fa.mont_mul_impl(FQ, p.x, i)
    x3 = fa.sub_impl(FQ, fa.sub_impl(FQ, fa.mont_sqr_impl(FQ, rr), j),
                     fa.double_impl(FQ, v))
    y3 = fa.sub_impl(FQ, fa.mont_mul_impl(FQ, rr, fa.sub_impl(FQ, v, x3)),
                     fa.double_impl(FQ, fa.mont_mul_impl(FQ, p.y, j)))
    z3 = fa.sub_impl(
        FQ,
        fa.sub_impl(FQ, fa.mont_sqr_impl(FQ, fa.add_impl(FQ, p.z, h)), z1z1),
        hh,
    )
    generic = JacobianPoints(x=x3, y=y3, z=z3)

    # doubling branch: 2*(qx, qy) from the affine coords (dbl-2009-alnr, a=0)
    xx = fa.mont_sqr_impl(FQ, qx)
    em = fa.mul_small_impl(FQ, xx, 3)
    yy = fa.mont_sqr_impl(FQ, qy)
    yyyy = fa.mont_sqr_impl(FQ, yy)
    s = fa.double_impl(
        FQ,
        fa.sub_impl(FQ, fa.sub_impl(FQ, fa.mont_sqr_impl(FQ, fa.add_impl(FQ, qx, yy)), xx), yyyy),
    )
    dx3 = fa.sub_impl(FQ, fa.mont_sqr_impl(FQ, em), fa.double_impl(FQ, s))
    dy3 = fa.sub_impl(FQ, fa.mont_mul_impl(FQ, em, fa.sub_impl(FQ, s, dx3)),
                      fa.mul_small_impl(FQ, yyyy, 8))
    dz3 = fa.double_impl(FQ, qy)
    dbl = JacobianPoints(x=dx3, y=dy3, z=dz3)

    p_inf = is_infinity_impl(p)
    x_eq = fa.eq_impl(FQ, u2, p.x)
    y_eq = fa.eq_impl(FQ, s2, p.y)
    is_dbl = jnp.logical_and(~p_inf, jnp.logical_and(x_eq, y_eq))
    is_neg = jnp.logical_and(~p_inf, jnp.logical_and(x_eq, ~y_eq))

    out = generic
    out = select_points(is_dbl, dbl, out)
    out = JacobianPoints(out.x, out.y, jnp.where(is_neg[None], 0, out.z))
    out = select_points(p_inf, JacobianPoints(qx, qy, one), out)
    return out


def madd_incomplete_impl(p: JacobianPoints, qx: jax.Array, qy: jax.Array,
                         one: jax.Array | None = None):
    """INCOMPLETE mixed addition: madd-2007-bl generic path only (7M+4S =
    11 Fq muls vs ~17 for the complete ``madd_impl``) plus the free
    p-at-infinity select. The exceptional cases (P == ±Q, detected as
    u2 == X1 with P finite) are NOT patched — lanes that hit one produce
    garbage and raise the returned ``exc`` flag instead. Callers
    accumulate the flag and rerun the complete engine on a hit; for
    cryptographically random bases (SRS powers of tau, puzzle
    commitments) the hit probability is ~2^-126 per add, so the fast
    kernel is the steady-state MSM hot path (ops/msm_pallas.py).

    Returns (points, exc) with exc a boolean batch-shape array.
    """
    if one is None:
        one = fa.broadcast_const(FQ, 1, qx.shape[1:])
    z1z1 = fa.mont_sqr_impl(FQ, p.z)
    u2 = fa.mont_mul_impl(FQ, qx, z1z1)
    s2 = fa.mont_mul_impl(FQ, qy, fa.mont_mul_impl(FQ, p.z, z1z1))
    h = fa.sub_impl(FQ, u2, p.x)
    rr = fa.double_impl(FQ, fa.sub_impl(FQ, s2, p.y))
    hh = fa.mont_sqr_impl(FQ, h)
    i = fa.mul_small_impl(FQ, hh, 4)
    j = fa.mont_mul_impl(FQ, h, i)
    v = fa.mont_mul_impl(FQ, p.x, i)
    x3 = fa.sub_impl(FQ, fa.sub_impl(FQ, fa.mont_sqr_impl(FQ, rr), j),
                     fa.double_impl(FQ, v))
    y3 = fa.sub_impl(FQ, fa.mont_mul_impl(FQ, rr, fa.sub_impl(FQ, v, x3)),
                     fa.double_impl(FQ, fa.mont_mul_impl(FQ, p.y, j)))
    z3 = fa.sub_impl(
        FQ,
        fa.sub_impl(FQ, fa.mont_sqr_impl(FQ, fa.add_impl(FQ, p.z, h)), z1z1),
        hh,
    )
    generic = JacobianPoints(x=x3, y=y3, z=z3)
    p_inf = is_infinity_impl(p)
    exc = jnp.logical_and(~p_inf, fa.eq_impl(FQ, u2, p.x))
    out = select_points(p_inf, JacobianPoints(qx, qy, one), generic)
    return out, exc


def neg_impl(p: JacobianPoints) -> JacobianPoints:
    return JacobianPoints(x=p.x, y=fa.neg_impl(FQ, p.y), z=p.z)


def scalar_mul_impl(p: JacobianPoints, e: int) -> JacobianPoints:
    """Fixed-scalar multiply (host-known e), double-and-add via scan."""
    e %= params.FR_MODULUS
    if e == 0:
        return infinity(p.batch_shape)
    bits = jnp.array([int(c) for c in bin(e)[2:]], dtype=jnp.int32)

    def body(acc, bit):
        acc = double_impl(acc)
        with_add = add_impl(acc, p)
        return select_points(bit != 0, with_add, acc), None

    out, _ = jax.lax.scan(body, infinity(p.batch_shape), bits)
    return out


def to_affine_impl(p: JacobianPoints) -> tuple[jax.Array, jax.Array, jax.Array]:
    """-> (x, y, is_inf). Batched inversion via Fermat (lanes at infinity
    produce zeros, flagged by is_inf)."""
    zinv = fa.inv_impl(FQ, p.z)
    zinv2 = fa.mont_sqr_impl(FQ, zinv)
    x = fa.mont_mul_impl(FQ, p.x, zinv2)
    y = fa.mont_mul_impl(FQ, p.y, fa.mont_mul_impl(FQ, zinv, zinv2))
    return x, y, is_infinity_impl(p)


# Public jitted wrappers -----------------------------------------------------

double = jax.jit(double_impl)
add = jax.jit(add_impl)
madd = jax.jit(madd_impl)
neg = jax.jit(neg_impl)
scalar_mul = functools.partial(jax.jit, static_argnums=(1,))(scalar_mul_impl)
to_affine = jax.jit(to_affine_impl)
is_infinity = jax.jit(is_infinity_impl)


# -- host conversion ---------------------------------------------------------


def encode_points(pts) -> JacobianPoints:
    """List of reference Jacobian tuples -> batched limb arrays."""
    xs = FQ.encode([int(p[0]) for p in pts])
    ys = FQ.encode([int(p[1]) for p in pts])
    zs = FQ.encode([int(p[2]) for p in pts])
    return JacobianPoints(x=jnp.array(xs), y=jnp.array(ys), z=jnp.array(zs))


def decode_points(p: JacobianPoints) -> list[tuple]:
    """Batched points -> list of reference Jacobian tuples (compare via
    ref.g1.affine on both sides, Jacobian coords are class representatives)."""
    xs = FQ.decode(jnp.asarray(p.x))
    ys = FQ.decode(jnp.asarray(p.y))
    zs = FQ.decode(jnp.asarray(p.z))
    return list(zip(xs, ys, zs))
