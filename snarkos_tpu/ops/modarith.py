"""Batched multi-precision modular arithmetic in 16-bit limbs on int32 lanes.

This is the field-arithmetic backend of the framework (SURVEY.md §7
Phase 1; reference hot paths in §2.10 run this math inside snarkVM's Rust
on rayon threads — here it is data-parallel across VPU lanes).

Representation
--------------
A batch of field elements is an int32 array of shape ``(L, *batch)``:
little-endian 16-bit limbs, limbs-first so that each limb row is a
contiguous vector. Elements are kept in Montgomery form (x * R mod p,
R = 2^(16 L)) and canonically reduced (< p, limbs < 2^16) between ops.

Overflow analysis (why int32 never overflows)
---------------------------------------------
Products of two 16-bit limbs are computed with a wrapping int32 multiply:
the bit pattern equals the true 32-bit product, and ``& 0xFFFF`` /
``>> 16 & 0xFFFF`` extract the exact lo/hi halves regardless of sign.
Column accumulators only ever sum 16-bit halves: a full Montgomery
multiply contributes at most 2L lo/hi terms from the operand product,
2L from the reduction, plus carry folds (< 2^8 each), so columns stay
below 4L * 2^16 + L * 2^8 < 2^23 for L = 24 — far inside int32 range.

The Montgomery reduction is SOS (separated operand scanning) with the
per-limb factor m_i = t_i * (-p^-1 mod 2^16) mod 2^16; the final result
is < 2p and one conditional subtraction canonicalizes it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from snarkos_tpu.ops.fieldspec import LIMB_BITS, LIMB_MASK, FieldSpec

# ---------------------------------------------------------------------------
# helpers on lists of limb rows (each row: int32 array of the batch shape)
# ---------------------------------------------------------------------------


def _rows(x: jax.Array) -> list[jax.Array]:
    return [x[i] for i in range(x.shape[0])]


def _stack(rows: list[jax.Array]) -> jax.Array:
    return jnp.stack(rows, axis=0)


def _normalize(cols: list[jax.Array], nout: int) -> list[jax.Array]:
    """Serial carry propagation: columns (possibly negative, |.| < 2^30)
    -> ``nout`` canonical 16-bit limbs. Any further carry must be provably
    zero at the call site."""
    out = []
    carry = None
    for i in range(nout):
        t = cols[i] if i < len(cols) else None
        if t is None:
            t = carry
        elif carry is not None:
            t = t + carry
        out.append(t & LIMB_MASK)
        carry = t >> LIMB_BITS  # arithmetic shift: exact floor for negatives
    return out


def _cond_sub_p(spec: FieldSpec, limbs: list[jax.Array]) -> list[jax.Array]:
    """Subtract p once if value >= p (input < 2p, canonical limbs)."""
    diff = []
    borrow = None
    for i in range(spec.nlimbs):
        d = limbs[i] - spec.p_limbs[i]
        if borrow is not None:
            d = d - borrow
        diff.append(d & LIMB_MASK)
        borrow = (d >> LIMB_BITS) & 1
    ge_p = borrow == 0
    return [jnp.where(ge_p, d, l) for d, l in zip(diff, limbs)]


# ---------------------------------------------------------------------------
# public ops — all take/return (L, *batch) int32 arrays in Montgomery form
# ---------------------------------------------------------------------------


def add_impl(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    cols = _rows(a + b)
    return _stack(_cond_sub_p(spec, _normalize(cols, spec.nlimbs)))


def sub_impl(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    # a - b + p keeps every intermediate in (−2^16, 2^17); result < 2p.
    cols = [ai - bi + pi for ai, bi, pi in zip(_rows(a), _rows(b), spec.p_limbs)]
    return _stack(_cond_sub_p(spec, _normalize(cols, spec.nlimbs)))


def neg_impl(spec: FieldSpec, a: jax.Array) -> jax.Array:
    # p - a, then conditional subtract handles a == 0 (result p -> 0).
    cols = [pi - ai for ai, pi in zip(_rows(a), spec.p_limbs)]
    return _stack(_cond_sub_p(spec, _normalize(cols, spec.nlimbs)))


def double_impl(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return add_impl(spec, a, a)


# Trace-time mode switch: Pallas kernel bodies use the fully-unrolled
# multiply (Mosaic keeps every intermediate in VMEM/registers and compiles
# the flat op stream quickly); plain XLA paths use the rolled lax.scan
# formulation below, whose graph is O(L) instead of O(L^2) — the unrolled
# form takes XLA (especially XLA:CPU) minutes to compile per shape.
_FORCE_UNROLLED = False


class unrolled_muls:
    """Context manager: force the unrolled multiply while tracing (used by
    ops/g1_pallas.py around pallas_call so kernel bodies stay flat)."""

    def __enter__(self):
        global _FORCE_UNROLLED
        self._prev = _FORCE_UNROLLED
        _FORCE_UNROLLED = True

    def __exit__(self, *exc):
        global _FORCE_UNROLLED
        _FORCE_UNROLLED = self._prev
        return False


def mont_mul_impl(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    """a * b * R^{-1} mod p — the workhorse. ~2 L^2 int32 multiplies.

    Dispatch: inside Pallas kernel bodies (``unrolled_muls``) the flat
    unrolled op stream; on TPU for large batches a dedicated elementwise
    Pallas kernel (the rolled scan's (2L+1, batch) carried accumulator
    costs ~50x the useful HBM traffic at NTT/Poseidon batch sizes —
    measured 2.7 s for a 2^22 NTT that the kernel path runs in ~0.2 s);
    otherwise the rolled lax.scan form (compact graphs, fast XLA:CPU
    compiles for tests)."""
    if _FORCE_UNROLLED:
        return _mont_mul_unrolled(spec, a, b)
    if _pallas_batch(a, b) is not None:
        return _mont_mul_pallas(spec, a, b)
    return _mont_mul_rolled(spec, a, b)


# Elementwise-kernel dispatch threshold: below this many batch elements
# the pallas_call overhead and padding waste beat the rolled form's
# traffic penalty.
_PALLAS_MIN_BATCH = 1 << 13
_PALLAS_TILE = 2048


def _pallas_batch(a: jax.Array, b: jax.Array):
    """Broadcast batch shape if the TPU elementwise kernel should run."""
    try:
        if jax.default_backend() != "tpu":
            return None
    except RuntimeError:  # no backend yet (e.g. during early import)
        return None
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    n = 1
    for d in batch:
        n *= d
    if n < _PALLAS_MIN_BATCH:
        return None
    return batch


def _mont_mul_pallas(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = _pallas_batch(a, b)
    L = spec.nlimbs
    full = (L,) + tuple(batch)
    a = jnp.broadcast_to(a, full)
    b = jnp.broadcast_to(b, full)
    n = 1
    for d in batch:
        n *= d
    af = a.reshape(L, n)
    bf = b.reshape(L, n)
    n_pad = -(-n // _PALLAS_TILE) * _PALLAS_TILE
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n))
        af = jnp.pad(af, pad)
        bf = jnp.pad(bf, pad)

    def kernel(a_ref, b_ref, o_ref):
        global _FORCE_UNROLLED
        prev, _FORCE_UNROLLED = _FORCE_UNROLLED, True
        try:
            o_ref[...] = _mont_mul_unrolled(spec, a_ref[...], b_ref[...])
        finally:
            _FORCE_UNROLLED = prev

    spec_blk = pl.BlockSpec((L, _PALLAS_TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // _PALLAS_TILE,),
        in_specs=[spec_blk, spec_blk],
        out_specs=spec_blk,
        out_shape=jax.ShapeDtypeStruct((L, n_pad), jnp.int32),
    )(af, bf)
    return out[:, :n].reshape(full)


def _mont_mul_rolled(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    """Rolled CIOS-style Montgomery multiply: two lax.scans of length L.

    Stage A accumulates the operand-product columns by Horner over a's
    limbs (high limb first; each step shifts the accumulator up one limb
    and adds the (L+1)-column contribution of one a-limb). Stage B is the
    Montgomery reduction: each step folds the lowest column into a
    multiple of 2^16 via m = t0 * (-p^-1) mod 2^16, pushes its carry up,
    and drops the consumed column (shift down). Column values are exactly
    the unrolled version's column sums, so the overflow analysis in the
    module docstring carries over unchanged; results are bit-identical.
    """
    L = spec.nlimbs
    # operands may broadcast against each other (e.g. an (L, 1) constant
    # times an (L, B) batch) — accumulate at the broadcast batch shape
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    zero_row = jnp.zeros((1,) + tuple(batch), jnp.int32)
    p_col = jnp.array(spec.p_limbs, dtype=jnp.int32).reshape((L,) + (1,) * len(batch))

    def prod_step(t, a_i):
        prod = a_i[None] * b  # wrapping int32; lo/hi halves are exact
        lo = prod & LIMB_MASK
        hi = (prod >> LIMB_BITS) & LIMB_MASK
        contrib = (jnp.concatenate([lo, zero_row], axis=0)
                   + jnp.concatenate([zero_row, hi], axis=0))  # (L+1, batch)
        t = jnp.concatenate([zero_row, t[:-1]], axis=0)  # acc *= 2^16
        # static slice + concat (NOT .at[].add scatter: scatter cannot
        # resolve an output sharding when the accumulator is replicated
        # and the update is batch-sharded — breaks pjit'ed callers)
        t = jnp.concatenate([t[: L + 1] + contrib, t[L + 1 :]], axis=0)
        return t, None

    t0 = jnp.zeros((2 * L + 1,) + tuple(batch), jnp.int32)
    t, _ = jax.lax.scan(prod_step, t0, a[::-1])

    def red_step(t, _):
        tcur = t[0]  # full column value (nonnegative, < 2^23)
        carry0 = tcur >> LIMB_BITS
        ti = tcur & LIMB_MASK
        m = (ti * spec.n0inv) & LIMB_MASK
        prod = m[None] * p_col
        lo = prod & LIMB_MASK
        hi = (prod >> LIMB_BITS) & LIMB_MASK
        # ti + lo[0] is a multiple of 2^16 by construction of m
        extra0 = (ti + lo[0]) >> LIMB_BITS
        contrib = (jnp.concatenate([lo, zero_row], axis=0)
                   + jnp.concatenate([zero_row, hi], axis=0))
        t = jnp.concatenate([t[: L + 1] + contrib, t[L + 1 :]], axis=0)
        t = jnp.concatenate([t[:1], (t[1] + carry0 + extra0)[None], t[2:]], axis=0)
        # drop the consumed (folded) bottom column
        t = jnp.concatenate([t[1:], zero_row], axis=0)
        return t, None

    t, _ = jax.lax.scan(red_step, t, None, length=L)
    out = _normalize([t[i] for i in range(L + 1)], L + 1)
    # result < 2p < 2^(16 L): top column is provably zero after carries
    return _stack(_cond_sub_p(spec, out[:L]))


# One-level Karatsuba for the unrolled operand product: 3 (L/2)^2
# schoolbook products instead of L^2 (432 vs 576 int32 multiplies at
# L = 24). Subtractive variant so every multiplied magnitude stays 16-bit
# (the wrapping-int32 lo/hi split requires it); the middle term's sign
# rides the column accumulators, which tolerate negatives (_normalize and
# the reduction use arithmetic shifts + masks, value-exact for signed
# columns). Column magnitude stays < 6L*2^16 < 2^24 — far inside int32.
KARATSUBA = True


def _abs_diff_rows(lo: list, hi: list):
    """|lo - hi| as canonical 16-bit limbs + the sign (1 if lo < hi),
    via two borrow chains and a select."""
    n = len(lo)
    fwd, bwd = [], []
    b1 = b2 = None
    for i in range(n):
        d = lo[i] - hi[i] - (b1 if b1 is not None else 0)
        fwd.append(d & LIMB_MASK)
        b1 = (d >> LIMB_BITS) & 1
        e = hi[i] - lo[i] - (b2 if b2 is not None else 0)
        bwd.append(e & LIMB_MASK)
        b2 = (e >> LIMB_BITS) & 1
    neg = b1  # lo < hi
    out = [jnp.where(neg == 1, bwd[i], fwd[i]) for i in range(n)]
    return out, neg


def _school_cols(xr: list, yr: list) -> list:
    """h x h schoolbook product as 2h columns of exact 16-bit halves."""
    h = len(xr)
    cols: list = [None] * (2 * h)

    def put(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(h):
        for j in range(h):
            prod = xr[i] * yr[j]
            put(i + j, prod & LIMB_MASK)
            put(i + j + 1, (prod >> LIMB_BITS) & LIMB_MASK)
    return cols


def _mont_mul_unrolled(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    L = spec.nlimbs
    ar, br = _rows(a), _rows(b)
    t: list = [None] * (2 * L + 1)

    def acc(k, v):
        t[k] = v if t[k] is None else t[k] + v

    if KARATSUBA and L % 2 == 0 and L >= 8:
        h = L // 2
        z0 = _school_cols(ar[:h], br[:h])
        z2 = _school_cols(ar[h:], br[h:])
        da, sa = _abs_diff_rows(ar[:h], ar[h:])
        db, sb = _abs_diff_rows(br[:h], br[h:])
        mid = _school_cols(da, db)
        # (a_lo-a_hi)(b_lo-b_hi) = (-1)^(sa^sb) mid;
        # z1 = z0 + z2 - (-1)^(sa^sb) mid
        mid_neg = (sa ^ sb) == 0  # subtract mid when signs agree
        for c in range(2 * h):
            acc(c, z0[c])
            acc(c + 2 * h, z2[c])
            acc(c + h, z0[c] + z2[c] + jnp.where(mid_neg, -mid[c], mid[c]))
    else:
        # operand product, columns of exact 16-bit halves
        for i in range(L):
            for j in range(L):
                prod = ar[i] * br[j]
                acc(i + j, prod & LIMB_MASK)
                acc(i + j + 1, (prod >> LIMB_BITS) & LIMB_MASK)

    # SOS Montgomery reduction
    for i in range(L):
        tcur = t[i]
        carry = tcur >> LIMB_BITS
        ti = tcur & LIMB_MASK
        acc(i + 1, carry)
        m = (ti * spec.n0inv) & LIMB_MASK
        prod0 = m * spec.p_limbs[0]
        # ti + lo(m*p0) is a multiple of 2^16 by construction of m
        acc(i + 1, ((ti + (prod0 & LIMB_MASK)) >> LIMB_BITS) + ((prod0 >> LIMB_BITS) & LIMB_MASK))
        for j in range(1, L):
            prod = m * spec.p_limbs[j]
            acc(i + j, prod & LIMB_MASK)
            acc(i + j + 1, (prod >> LIMB_BITS) & LIMB_MASK)

    out = _normalize(t[L : 2 * L + 1], L + 1)
    # result < 2p < 2^(16 L): top column is provably zero after carries
    return _stack(_cond_sub_p(spec, out[:L]))


def mont_sqr_impl(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return mont_mul_impl(spec, a, a)


def mont_pow_impl(spec: FieldSpec, a: jax.Array, e: int) -> jax.Array:
    """a^e in Montgomery form (e a fixed Python int), via lax.scan over the
    exponent bits so the traced graph stays O(one multiply)."""
    if e == 0:
        return broadcast_const(spec, 1, a.shape[1:])
    bits = jnp.array([int(c) for c in bin(e)[2:]], dtype=jnp.int32)

    def body(acc, bit):
        acc = mont_sqr_impl(spec, acc)
        with_mul = mont_mul_impl(spec, acc, a)
        return jnp.where(bit != 0, with_mul, acc), None

    init = broadcast_const(spec, 1, a.shape[1:])
    out, _ = jax.lax.scan(body, init, bits)
    return out


def inv_impl(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """Batched inversion via Fermat: (aR)^(p-2) * R-chain = a^{-1} R.
    Inverse of 0 is 0 (callers handle the point-at-infinity case)."""
    return mont_pow_impl(spec, a, spec.p - 2)


def to_mont_impl(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return mont_mul_impl(spec, a, broadcast_const(spec, spec.mont_r2, a.shape[1:], mont=False))


def from_mont_impl(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return mont_mul_impl(spec, a, broadcast_const(spec, 1, a.shape[1:], mont=False))


def is_zero_impl(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """Boolean array of batch shape (canonical input)."""
    return jnp.all(a == 0, axis=0)


def eq_impl(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.all(a == b, axis=0)


@functools.lru_cache(maxsize=None)
def _const_cache(spec: FieldSpec, value: int, mont: bool) -> tuple:
    v = value % spec.p
    if mont:
        v = v * spec.mont_r % spec.p
    return tuple((v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(spec.nlimbs))


def broadcast_const(spec: FieldSpec, value: int, batch_shape: tuple, mont: bool = True) -> jax.Array:
    """A constant field element broadcast to (L, *batch_shape).

    Note: when ``mont=True`` the value is interpreted as canonical and
    converted; pass ``mont=False`` to place raw limbs (e.g. R^2 itself).
    """
    limbs = _const_cache(spec, value, mont)
    col = jnp.array(limbs, dtype=jnp.int32).reshape((spec.nlimbs,) + (1,) * len(batch_shape))
    return jnp.broadcast_to(col, (spec.nlimbs,) + tuple(batch_shape))


def mul_small_impl(spec: FieldSpec, a: jax.Array, k: int) -> jax.Array:
    """Multiply by a small constant 0 <= k <= 8 via add chain."""
    assert 0 <= k <= 8
    if k == 0:
        return jnp.zeros_like(a)
    acc = None
    addend = a
    while k:
        if k & 1:
            acc = addend if acc is None else add_impl(spec, acc, addend)
        k >>= 1
        if k:
            addend = add_impl(spec, addend, addend)
    return acc


# ---------------------------------------------------------------------------
# Public jitted API (spec and fixed ints are static args). The *_impl
# versions above are pure and safe to call inside Pallas kernels or other
# traced contexts.
# ---------------------------------------------------------------------------

add = functools.partial(jax.jit, static_argnums=(0,))(add_impl)
sub = functools.partial(jax.jit, static_argnums=(0,))(sub_impl)
neg = functools.partial(jax.jit, static_argnums=(0,))(neg_impl)
double = functools.partial(jax.jit, static_argnums=(0,))(double_impl)
mont_mul = functools.partial(jax.jit, static_argnums=(0,))(mont_mul_impl)
mont_sqr = functools.partial(jax.jit, static_argnums=(0,))(mont_sqr_impl)
mont_pow = functools.partial(jax.jit, static_argnums=(0, 2))(mont_pow_impl)
inv = functools.partial(jax.jit, static_argnums=(0,))(inv_impl)
to_mont = functools.partial(jax.jit, static_argnums=(0,))(to_mont_impl)
from_mont = functools.partial(jax.jit, static_argnums=(0,))(from_mont_impl)
is_zero = functools.partial(jax.jit, static_argnums=(0,))(is_zero_impl)
eq = functools.partial(jax.jit, static_argnums=(0,))(eq_impl)
mul_small = functools.partial(jax.jit, static_argnums=(0, 2))(mul_small_impl)
