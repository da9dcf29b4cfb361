"""Distributed radix-2 NTT via the four-step algorithm (BASELINE config #2).

A length-N transform is reshaped to an (N1, N2) matrix and computed as
column NTTs -> twiddle scaling -> row NTTs, with ``lax.all_to_all``
resharding between phases so every local NTT is a batch of contiguous
single-chip transforms (ops/ntt.py). This is the TPU-native replacement
for the reference's rayon in-process butterflies (SURVEY.md §2.11,
§5 "Long-context / sequence parallelism" row: stage exchange designed
fresh for ICI).

Derivation (omega = omega_N, j = j1*N2 + j2, k = k1 + N1*k2):
    X[k1 + N1 k2] = NTT2_{j2->k2}( omega^{j2 k1} * NTT1_{j1->k1}(A[j1, j2]) )
so with input viewed as A[j1, j2] (row-major) the output lands in natural
order after a final transpose — which is exactly one more all_to_all.

All arrays are (L, ...) Montgomery Fr limb tensors.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import ntt as ref
from snarkos_tpu.ops import modarith as fa
from snarkos_tpu.ops import ntt as ntt_ops
from snarkos_tpu.ops.fieldspec import FR

R = params.FR_MODULUS


def _split(n: int) -> tuple[int, int]:
    """N = N1 * N2 with N1 <= N2, both powers of two."""
    log_n = n.bit_length() - 1
    log_n1 = log_n // 2
    return 1 << log_n1, 1 << (log_n - log_n1)


@functools.lru_cache(maxsize=None)
def _twiddle_matrix(n: int, invert: bool) -> jax.Array:
    """T[k1, j2] = omega^{k1 * j2} as (L, N1, N2) Montgomery limbs.

    Built on device: R_b[j2] = omega^{2^b * j2} rows by repeated squaring
    of a geometric progression; T = prod over set bits b of k1.
    """
    n1, n2 = _split(n)
    omega = ref.root_of_unity(n)
    if invert:
        omega = pow(omega, -1, R)

    @jax.jit
    def build():
        base = jnp.array(FR.encode([omega]))
        row = ntt_ops.geometric_powers(base, n2)  # (L, n2) = omega^{j2}
        t = fa.broadcast_const(FR, 1, (n1, n2))
        k1_ids = jnp.arange(n1, dtype=jnp.int32)[:, None]  # (n1, 1)
        for b in range(int(math.log2(n1)) if n1 > 1 else 0):
            has_bit = (k1_ids >> b) & 1  # (n1, 1)
            term = fa.mont_mul_impl(FR, t, row[:, None, :])
            t = jnp.where((has_bit != 0)[None], term, t)
            row = fa.mont_sqr_impl(FR, row)
        return t

    return build()


def ntt_dist(x: jax.Array, mesh: Mesh, invert: bool = False, axis: str = "x") -> jax.Array:
    """Distributed NTT of a (L, N) sharded array; returns (L, N) natural
    order with the same sharding. N1, N2 and N1/D, N2/D must be integral."""
    L, n = x.shape
    n1, n2 = _split(n)
    d = mesh.shape[axis]
    assert n1 % d == 0 and n2 % d == 0, (n1, n2, d)
    tw = _twiddle_matrix(n, invert)
    tw = jax.device_put(tw, NamedSharding(mesh, P(None, None, axis)))
    # note: no extra 1/N scaling here — the inverse column pass scales by
    # 1/N1 and the inverse row pass by 1/N2, which compose to 1/N.

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    def body(x_local, tw_local):
        # x_local: (L, N/D) = N1/D contiguous rows of the (N1, N2) matrix
        a = x_local.reshape(L, n1 // d, n2)
        # -> shard along j2 so column NTTs are local
        a = jax.lax.all_to_all(a, axis, split_axis=2, concat_axis=1, tiled=True)
        # column NTTs (length n1, batched over local j2)
        a = a.transpose(0, 2, 1)  # (L, n2/d, n1)
        a = ntt_ops.ntt_batched(a, invert)
        a = a.transpose(0, 2, 1)  # (L, n1, n2/d)
        # twiddle scale
        a = fa.mont_mul_impl(FR, a, tw_local)
        # -> shard along k1 so row NTTs are local
        a = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=2, tiled=True)
        # row NTTs (length n2, batched over local k1)
        a = ntt_ops.ntt_batched(a, invert)  # (L, n1/d, n2)
        # natural order: X[k1 + n1 k2] -> transpose to (k2, k1) and reshard
        a = a.transpose(0, 2, 1)  # (L, n2, n1/d)
        a = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=2, tiled=True)
        return a.reshape(L, (n2 // d) * n1)

    # jit the shard_map call: eager shard_map dispatch bypasses the
    # persistent compilation cache (see parallel/msm_dist.py)
    return jax.jit(body)(x, tw)


def intt_dist(x: jax.Array, mesh: Mesh, axis: str = "x") -> jax.Array:
    return ntt_dist(x, mesh, invert=True, axis=axis)
