"""Radix-2 NTT over Fr on TPU (BASELINE config #2, single-chip path).

Bit-exact against crypto/ref/ntt.py. Decimation-in-time with a one-shot
bit-reversal gather, then log2(N) fully-vectorized butterfly stages: at
stage with half-length m the array is viewed as (L, B, N/2m, 2, m) and the
butterfly is two adds and one twiddle mont_mul over the whole tensor —
no scalar loops, static shapes throughout (XLA-friendly; the reference
runs this on rayon CPU threads inside snarkVM).

Compile economy (the round-2 lesson): the per-stage twiddle tables are
passed to the jitted kernel as RUNTIME ARGUMENTS, never captured as
traced constants — at 2^22 the captured tables totalled ~256 MiB of
graph literals, which is what overflowed the compiler's request limit
(HTTP 413). The tables themselves are strided views of one master
omega-power table built with <=2 full-width Montgomery multiplies from
tiny host-computed 8-bit-digit power tables.

Distributed (multi-host) NTT lives in parallel/ntt_dist.py (four-step
algorithm with all-to-all stage exchange).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import ntt as ref
from snarkos_tpu.ops import modarith as fa
from snarkos_tpu.ops.fieldspec import FR

R = params.FR_MODULUS

_DIGIT_BITS = 8


@functools.lru_cache(maxsize=None)
def _bitrev_perm(n: int) -> np.ndarray:
    log_n = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for _ in range(log_n):
        rev = (rev << 1) | (idx & 1)
        idx >>= 1
    return rev.astype(np.int32)


@functools.partial(jax.jit, static_argnums=(1,))
def geometric_powers(base: jax.Array, m: int) -> jax.Array:
    """(L, 1) Montgomery base -> (L, m) powers [1, b, b^2, ..., b^{m-1}].

    Blocked, scan-structured: the first block of B powers is built by a
    scan over the index bits (one mont_mul trace), then successive blocks
    are produced by a scan multiplying by b^B — total work O(m) multiplies
    with an O(1)-stage compiled graph at every size (the round-2 doubling
    ladder unrolled log2(m) multiply graphs, growing the compiled graph
    linearly with log m).
    """
    if m == 1:
        return fa.broadcast_const(FR, 1, (1,))
    bbits = min(12, (m - 1).bit_length())
    B = 1 << bbits

    def sq(b, _):
        return fa.mont_sqr_impl(FR, b), b

    base_B, pows = jax.lax.scan(sq, base, None, length=bbits)  # pows[k] = b^(2^k)

    i = jnp.arange(B, dtype=jnp.int32)
    masks = jnp.left_shift(jnp.int32(1), jnp.arange(bbits, dtype=jnp.int32))

    def mul_step(acc, pk_mask):
        pk, mask = pk_mask
        sel = (i & mask) != 0
        return jnp.where(sel[None], fa.mont_mul_impl(FR, acc, pk), acc), None

    block0, _ = jax.lax.scan(mul_step, fa.broadcast_const(FR, 1, (B,)), (pows, masks))

    nblocks = -(-m // B)
    if nblocks == 1:
        return block0[:, :m]

    def blk(cur, _):
        return fa.mont_mul_impl(FR, cur, base_B), cur

    _, blocks = jax.lax.scan(blk, block0, None, length=nblocks)  # (nblocks, L, B)
    return jnp.moveaxis(blocks, 0, 1).reshape(FR.nlimbs, nblocks * B)[:, :m]


# The twiddle caches below hold CONCRETE device arrays; at n=2^22 a single
# entry is O(n * nlimbs * 4B) ~ 100+ MB, so they are bounded (4 entries =
# forward+inverse of two active sizes) instead of growing per size forever
# (r4 advisory: unbounded lru_cache pinned hundreds of MB of HBM).
@functools.lru_cache(maxsize=4)
def _master_table(n: int, invert: bool) -> jax.Array:
    """(L, n/2) Montgomery table W[i] = omega^i (omega of order n, or its
    inverse). Host computes per-8-bit-digit power tables with bigints;
    the device combines them with <=2 full-width Montgomery multiplies.

    Computed under ensure_compile_time_eval so the cached array is
    CONCRETE even when the first call happens while tracing a jitted NTT
    (otherwise the lru_cache would capture and leak tracers)."""
    omega = ref.root_of_unity(n)
    if invert:
        omega = pow(omega, -1, R)
    half = max(n // 2, 1)
    ndigits = max(1, -(-max(half.bit_length() - 1, 1) // _DIGIT_BITS))
    with jax.ensure_compile_time_eval():
        tables = []
        for k in range(ndigits):
            base = pow(omega, 1 << (_DIGIT_BITS * k), R)
            size = min(1 << _DIGIT_BITS, half)
            tables.append(jnp.array(FR.encode([pow(base, d, R) for d in range(size)])))
        idx = jnp.arange(half, dtype=jnp.int32)
        mask = (1 << _DIGIT_BITS) - 1
        out = jnp.take(tables[0], idx & mask, axis=-1)
        for k in range(1, ndigits):
            digit = (idx >> (_DIGIT_BITS * k)) & mask
            out = fa.mont_mul_impl(FR, out, jnp.take(tables[k], digit, axis=-1))
        return out


@functools.lru_cache(maxsize=4)
def _master_table_base(n: int, omega: int, size: int) -> jax.Array:
    """(L, size) Montgomery table W[i] = omega^i for a caller-chosen root
    (the four-step path needs powers of omega_N up to N-1, and small-NTT
    tables for omega_F = omega_N^(N/F) — the SAME root family, which the
    algebra of the decomposition requires; ref.root_of_unity(F) could be a
    different primitive F-th root)."""
    ndigits = max(1, -(-max(size.bit_length() - 1, 1) // _DIGIT_BITS))
    with jax.ensure_compile_time_eval():
        tables = []
        for k in range(ndigits):
            base = pow(omega, 1 << (_DIGIT_BITS * k), R)
            tsize = min(1 << _DIGIT_BITS, size)
            tables.append(jnp.array(FR.encode([pow(base, d, R) for d in range(tsize)])))
        idx = jnp.arange(size, dtype=jnp.int32)
        mask = (1 << _DIGIT_BITS) - 1
        out = jnp.take(tables[0], idx & mask, axis=-1)
        for k in range(1, ndigits):
            digit = (idx >> (_DIGIT_BITS * k)) & mask
            out = fa.mont_mul_impl(FR, out, jnp.take(tables[k], digit, axis=-1))
        return out


@functools.lru_cache(maxsize=4)
def _stage_twiddles(n: int, invert: bool) -> tuple:
    """Per-stage twiddle limb arrays: stage s (half-length m = 2^s) gets
    (L, 1, m) Montgomery twiddles w_len^j, w_len = omega^(n / 2m) — i.e.
    the stride-2^(S-1-s) subsample of the master table. Concrete device
    arrays, handed to the jitted kernel as runtime inputs."""
    master = _master_table(n, invert)
    log_n = n.bit_length() - 1
    out = []
    with jax.ensure_compile_time_eval():
        for s in range(log_n):
            m = 1 << s
            step = 1 << (log_n - 1 - s)
            out.append(master[:, ::step].reshape(FR.nlimbs, 1, m))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _n_inv_const(n: int):
    with jax.ensure_compile_time_eval():
        return jnp.array(FR.encode([pow(n, -1, R)]))  # (L, 1)


@functools.partial(jax.jit, static_argnums=(4,))
def _ntt_kernel(a, perm, twiddles, n_inv, invert: bool):
    """(L, B, n) bit-reversible input; perm/twiddles/n_inv are runtime
    args (device-resident, cached by the callers) so the graph carries no
    large literals."""
    L, B, n = a.shape
    a = jnp.take(a, perm, axis=-1)
    m = 1
    for tw in twiddles:
        groups = n // (2 * m)
        v = a.reshape(L, B, groups, 2, m)
        u, w = v[:, :, :, 0, :], v[:, :, :, 1, :]
        w = fa.mont_mul_impl(FR, w, tw[:, None])  # (L,1,1,m) broadcast
        a = jnp.stack([fa.add_impl(FR, u, w), fa.sub_impl(FR, u, w)], axis=3).reshape(L, B, n)
        m *= 2
    if invert:
        a = fa.mont_mul_impl(FR, a, n_inv[:, None])
    return a


# ---------------------------------------------------------------------------
# four-step (Bailey) NTT — the large-size hot path
# ---------------------------------------------------------------------------
#
# The stage-loop kernel above keeps the butterfly half-length m on the
# TRAILING (lane) axis, so stages with m < 128 use a fraction of the 128
# VPU lanes and every stage's (.., 2, m) stack forces a relayout with the
# sublane dim stuck at 2/8 — measured ~3.6x below the bandwidth roofline
# at 2^22 (BENCH_NOTES.md).  The four-step decomposition N = n1*n2 runs
# two passes of small column-NTTs whose butterflies index a LEADING axis
# while a large flattened batch rides the lane axis — every elementwise
# op is full-width at every stage:
#
#   X[k1 + n1*k2] = Sum_{j2} w_N^{j2 k1} w_{n2}^{j2 k2}
#                     [ Sum_{j1} A[j2 + n2*j1] w_{n1}^{j1 k1} ]
#
#   1. reshape (n1, n2); NTT length n1 over axis 0, batch n2 trailing
#   2. elementwise mid-twiddle w_N^{k1*j2}  (cached (L, n1, n2) tensor)
#   3. transpose; NTT length n2 over axis 0, batch n1 trailing
#   4. the (k2, k1) result IS the natural-order output, flattened


def _ntt_axis1(a: jax.Array, perm: jax.Array, twiddles: tuple) -> jax.Array:
    """Radix-2 DIT butterflies along axis 1 of (L, F, T); T (the flattened
    batch) stays on the lane axis through every stage."""
    L, F, T = a.shape
    a = jnp.take(a, perm, axis=1)
    m = 1
    for tw in twiddles:  # tw: (L, m)
        groups = F // (2 * m)
        v = a.reshape(L, groups, 2, m, T)
        u, w = v[:, :, 0], v[:, :, 1]
        w = fa.mont_mul_impl(FR, w, tw[:, None, :, None])
        a = jnp.stack([fa.add_impl(FR, u, w), fa.sub_impl(FR, u, w)],
                      axis=2).reshape(L, F, T)
        m *= 2
    return a


@functools.lru_cache(maxsize=16)
def _small_stage_twiddles(n: int, f: int, invert: bool) -> tuple:
    """Stage twiddles (each (L, m)) for the length-f column NTT inside the
    four-step factorization of n, built from omega_f = omega_n^(n/f)."""
    omega = ref.root_of_unity(n)
    if invert:
        omega = pow(omega, -1, R)
    omega_f = pow(omega, n // f, R)
    master = _master_table_base(f, omega_f, max(f // 2, 1))
    log_f = f.bit_length() - 1
    with jax.ensure_compile_time_eval():
        return tuple(master[:, :: 1 << (log_f - 1 - s)][:, : 1 << s]
                     for s in range(log_f))


@functools.lru_cache(maxsize=4)
def _mid_twiddles(n: int, n1: int, invert: bool) -> jax.Array:
    """(L, n1, n2) tensor M[k1, j2] = omega_n^(k1*j2), cached per size."""
    n2 = n // n1
    omega = ref.root_of_unity(n)
    if invert:
        omega = pow(omega, -1, R)
    master = _master_table_base(n, omega, n)
    with jax.ensure_compile_time_eval():
        idx = (np.arange(n1, dtype=np.int64)[:, None]
               * np.arange(n2, dtype=np.int64)[None, :]) % n
        return jnp.take(master, jnp.asarray(idx.astype(np.int32).reshape(-1)),
                        axis=-1).reshape(FR.nlimbs, n1, n2)


@functools.partial(jax.jit, static_argnums=(5, 6))
def _ntt_four_step_kernel(a, perm1, tw1, mid, n_inv, n1: int, invert: bool):
    """a: (L, Br, n).  tw1 = per-stage twiddle tuples for BOTH column NTTs
    packed as (stages_n1, stages_n2, perm2); static args keep the traced
    graph free of large literals (all tables arrive as runtime inputs)."""
    stages_n1, stages_n2, perm2 = tw1
    L, Br, n = a.shape
    n2 = n // n1
    # step 1: NTT over j1, batch (Br, j2) trailing
    a4 = a.reshape(L, Br, n1, n2)
    a4 = jnp.moveaxis(a4, 1, 2).reshape(L, n1, Br * n2)
    a4 = _ntt_axis1(a4, perm1, stages_n1)
    # step 2: mid twiddle w_n^(k1*j2)
    a4 = a4.reshape(L, n1, Br, n2)
    a4 = fa.mont_mul_impl(FR, a4, mid[:, :, None, :])
    # step 3: NTT over j2, batch (k1, Br) trailing
    a4 = jnp.moveaxis(a4, 3, 1).reshape(L, n2, n1 * Br)
    a4 = _ntt_axis1(a4, perm2, stages_n2)
    # step 4: (k2, k1) -> flat n1*k2 + k1 is natural order
    a4 = a4.reshape(L, n2, n1, Br)
    out = jnp.moveaxis(a4, 3, 1).reshape(L, Br, n)
    if invert:
        out = fa.mont_mul_impl(FR, out, n_inv[:, None])
    return out


_FOUR_STEP_MIN = 1 << 12


def _ntt_dispatch(a: jax.Array, invert: bool) -> jax.Array:
    """(L, B, n) batched NTT: four-step for large sizes, stage-loop kernel
    for small ones (where table setup would dominate)."""
    L, B, n = a.shape
    if n < _FOUR_STEP_MIN:
        return _ntt_kernel(a, jnp.asarray(_bitrev_perm(n)),
                           _stage_twiddles(n, invert), _n_inv_const(n), invert)
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    n2 = n // n1
    tw = (_small_stage_twiddles(n, n1, invert),
          _small_stage_twiddles(n, n2, invert),
          jnp.asarray(_bitrev_perm(n2)))
    return _ntt_four_step_kernel(a, jnp.asarray(_bitrev_perm(n1)), tw,
                                 _mid_twiddles(n, n1, invert), _n_inv_const(n),
                                 n1, invert)


def ntt(a: jax.Array, invert: bool = False) -> jax.Array:
    """(L, N) Montgomery Fr coefficients -> (L, N) evaluations (or inverse).

    Natural order in, natural order out: NTT(a)[k] = sum_j a_j omega^{jk}.
    """
    L, n = a.shape
    assert n & (n - 1) == 0, "size must be a power of two"
    if n == 1:
        return a
    return _ntt_dispatch(a.reshape(L, 1, n), invert).reshape(L, n)


def intt(a: jax.Array) -> jax.Array:
    return ntt(a, invert=True)


def ntt_batched(a: jax.Array, invert: bool = False) -> jax.Array:
    """(L, B, N): independent NTTs over the trailing axis per batch row."""
    L, B, n = a.shape
    if n == 1:
        return a
    return _ntt_dispatch(a, invert)
