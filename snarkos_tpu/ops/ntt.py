"""Radix-2 NTT over Fr on TPU (BASELINE config #2, single-chip path).

Bit-exact against crypto/ref/ntt.py. Decimation-in-time with a one-shot
bit-reversal gather, then log2(N) fully-vectorized butterfly stages: at
stage with half-length m the array is viewed as (L, N/2m, 2, m) and the
butterfly is two adds and one twiddle mont_mul over the whole tensor —
no scalar loops, static shapes throughout (XLA-friendly; the reference
runs this on rayon CPU threads inside snarkVM).

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


@functools.lru_cache(maxsize=None)
def _bitrev_perm(n: int) -> np.ndarray:
    log_n = n.bit_length() - 1
    return np.array([ref.bit_reverse(i, log_n) for i in range(n)], dtype=np.int32)


@functools.partial(jax.jit, static_argnums=(1,))
def geometric_powers(base: jax.Array, m: int) -> jax.Array:
    """(L, 1) Montgomery base -> (L, m) powers [1, b, b^2, ..., b^{m-1}].

    Built on device by doubling (log2 m mont_mul passes over growing
    arrays) — avoids O(m) host bigint loops for large twiddle tables.
    """
    out = fa.broadcast_const(FR, 1, (1,))
    b_pow = base  # b^(2^k), squared each round
    while out.shape[-1] < m:
        out = jnp.concatenate([out, fa.mont_mul_impl(FR, out, b_pow)], axis=-1)
        b_pow = fa.mont_sqr_impl(FR, b_pow)
    return out[:, :m]


@functools.lru_cache(maxsize=None)
def _stage_twiddles(n: int, invert: bool) -> tuple:
    """Per-stage twiddle limb arrays: stage s (half-length m = 2^s) gets
    (L, 1, m) Montgomery twiddles w_len^j, w_len = omega^(n / 2m).

    Computed under ensure_compile_time_eval so the cached arrays are
    CONCRETE even when the first call happens while tracing a jitted NTT
    (otherwise the lru_cache would capture and leak tracers)."""
    omega = ref.root_of_unity(n)
    if invert:
        omega = pow(omega, -1, R)
    out = []
    with jax.ensure_compile_time_eval():
        m = 1
        while m < n:
            w_len = jnp.array(FR.encode([pow(omega, n // (2 * m), R)]))
            out.append(geometric_powers(w_len, m).reshape(FR.nlimbs, 1, m))
            m *= 2
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _n_inv_const(n: int):
    with jax.ensure_compile_time_eval():
        return jnp.array(FR.encode([pow(n, -1, R)]))  # (L, 1)


@functools.partial(jax.jit, static_argnums=(1,))
def ntt(a: jax.Array, invert: bool = False) -> jax.Array:
    """(L, N) Montgomery Fr coefficients -> (L, N) evaluations (or inverse).

    Natural order in, natural order out: NTT(a)[k] = sum_j a_j omega^{jk}.
    """
    L, n = a.shape
    assert n & (n - 1) == 0, "size must be a power of two"
    perm = jnp.array(_bitrev_perm(n))
    a = jnp.take(a, perm, axis=1)
    twiddles = _stage_twiddles(n, invert)
    m = 1
    for tw in twiddles:
        groups = n // (2 * m)
        v = a.reshape(L, groups, 2, m)
        u, w = v[:, :, 0, :], v[:, :, 1, :]
        w = fa.mont_mul(FR, w, tw)
        a = jnp.stack([fa.add(FR, u, w), fa.sub(FR, u, w)], axis=2).reshape(L, n)
        m *= 2
    if invert:
        a = fa.mont_mul(FR, a, _n_inv_const(n))
    return a


def intt(a: jax.Array) -> jax.Array:
    return ntt(a, invert=True)


@functools.partial(jax.jit, static_argnums=(1,))
def ntt_batched(a: jax.Array, invert: bool = False) -> jax.Array:
    """(L, B, N): independent NTTs over the trailing axis per batch row."""
    L, B, n = a.shape
    perm = jnp.array(_bitrev_perm(n))
    a = jnp.take(a, perm, axis=2)
    twiddles = _stage_twiddles(n, invert)
    m = 1
    for tw in twiddles:
        groups = n // (2 * m)
        v = a.reshape(L, B, groups, 2, m)
        u, w = v[:, :, :, 0, :], v[:, :, :, 1, :]
        w = fa.mont_mul(FR, w, tw[:, None])  # (L,1,1,m) broadcast
        a = jnp.stack([fa.add(FR, u, w), fa.sub(FR, u, w)], axis=3).reshape(L, B, n)
        m *= 2
    if invert:
        a = fa.mont_mul(FR, a, _n_inv_const(n)[:, None])
    return a
