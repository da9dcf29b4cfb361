"""Pippenger multi-scalar multiplication on TPU (BASELINE config #3).

The reference reaches MSM through snarkVM's puzzle prove/verify
(SURVEY.md §2.10, node/src/prover/mod.rs:254-258) where it runs on rayon
CPU threads with divergent bucket scatters. That shape is hostile to SIMD;
the TPU-native redesign reformulates bucket accumulation as
sort + segmented-sum (SURVEY.md §7 Phase 4 "sort/segment-sum
reformulation"):

  for each c-bit window (processed high→low in a Horner loop):
    1. digits  d_i from scalar limbs                    (vector shifts)
    2. sort point indices by digit                      (jnp.argsort)
    3. segmented inclusive scan over the sorted points  (associative_scan,
       work-efficient: ~2N group adds in 2 log2 N fused-kernel levels)
    4. bucket sums = scan values at segment tails       (searchsorted+gather)
    5. sum_b b*S_b = sum of suffix sums                 (reverse scan + tree
       reduction)
    6. acc = 2^c * acc + T_w                            (c doublings)

Every group operation is a complete branchless add; on TPU the adds run
as fused Pallas kernels (ops/g1_pallas.py). The machinery is generic over
a GroupOps so tests can validate the combinatorics with a cheap mock
group, and the distributed version (parallel/msm_dist.py) shards points
across chips and reduces partial results over ICI.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp

from snarkos_tpu.ops.fieldspec import FR

SCALAR_BITS = 253


# --------------------------------------------------------------------------
# group-ops protocol
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class GroupOps:
    """Abelian group elements as pytrees of arrays with trailing axis N."""

    identity: Callable[[int], Any]  # n -> element batch
    add: Callable[[Any, Any], Any]  # complete, branchless
    select: Callable[[jax.Array, Any, Any], Any]  # mask (n,) ? a : b
    gather: Callable[[Any, jax.Array], Any]  # take along trailing axis
    seg_combine: Callable[[Any, Any], Any] | None = None  # fused (flag, elem)


def _default_seg_combine(group: GroupOps):
    def combine(a, b):
        fa_, pa = a[0], a[1:]
        fb_, pb = b[0], b[1:]
        s = group.add(pa, pb)
        out = group.select(fb_[0, :] != 0, pb, s)
        return (fa_ | fb_,) + tuple(out)

    return combine


# --------------------------------------------------------------------------
# scalar digit decomposition
# --------------------------------------------------------------------------


def window_digits(scalar_limbs: jax.Array, c: int) -> jax.Array:
    """(16, N) canonical Fr limbs -> (W, N) c-bit window digits (LSB window
    first)."""
    nlimbs = scalar_limbs.shape[0]
    num_windows = -(-SCALAR_BITS // c)
    rows = []
    mask = (1 << c) - 1
    for w in range(num_windows):
        off = w * c
        k, sh = off // 16, off % 16
        d = scalar_limbs[k] >> sh
        # windows may straddle up to two additional limbs (c <= 16)
        bits_have = 16 - sh
        while bits_have < c and k + 1 < nlimbs:
            k += 1
            d = d | (scalar_limbs[k] << bits_have)
            bits_have += 16
        rows.append(d & mask)
    return jnp.stack(rows, axis=0)


# --------------------------------------------------------------------------
# the Pippenger engine
# --------------------------------------------------------------------------


def msm_generic(group: GroupOps, points, scalar_limbs: jax.Array, c: int):
    """Generic windowed-bucket MSM. ``points``: tuple of (.., N) arrays;
    returns a 1-wide element batch."""
    n = scalar_limbs.shape[-1]
    num_buckets = 1 << c
    digits = window_digits(scalar_limbs, c)  # (W, N)
    seg = group.seg_combine or _default_seg_combine(group)
    bucket_ids = jnp.arange(num_buckets, dtype=jnp.int32)

    def window_body(acc, digits_w):
        order = jnp.argsort(digits_w)
        keys = digits_w[order]
        pts = group.gather(points, order)
        head = jnp.concatenate(
            [jnp.ones((1,), jnp.int32), (keys[1:] != keys[:-1]).astype(jnp.int32)]
        )[None, :]
        scanned = jax.lax.associative_scan(seg, (head,) + tuple(pts), axis=1)
        scanned_pts = scanned[1:]
        # bucket sums sit at the last occurrence of each key
        pos = jnp.searchsorted(keys, bucket_ids, side="right").astype(jnp.int32) - 1
        nonempty = (pos >= 0) & (jnp.take(keys, jnp.maximum(pos, 0)) == bucket_ids)
        sums = group.gather(scanned_pts, jnp.maximum(pos, 0))
        sums = group.select(nonempty, sums, group.identity(num_buckets))
        # T_w = sum_b b * S_b = sum of suffix sums over b >= 1
        suffix = jax.lax.associative_scan(group.add, sums, axis=1, reverse=True)
        suffix = group.select(
            jnp.arange(num_buckets) > 0, suffix, group.identity(num_buckets)
        )
        width = num_buckets
        total = suffix
        while width > 1:
            half = width // 2
            lo = jax.tree_util.tree_map(lambda t: t[..., :half], total)
            hi = jax.tree_util.tree_map(lambda t: t[..., half:width], total)
            total = group.add(lo, hi)
            width = half
        # acc = 2^c * acc + T_w
        acc = jax.lax.fori_loop(0, c, lambda _, a: group.add(a, a), acc)
        acc = group.add(acc, total)
        return acc, None

    acc0 = group.identity(1)
    acc, _ = jax.lax.scan(window_body, acc0, digits[::-1])
    return acc


def default_window_bits(n: int) -> int:
    """Window size heuristic: c ~ log2(n) - 4, clamped to [4, 16]."""
    return max(4, min(16, n.bit_length() - 4))


# --------------------------------------------------------------------------
# G1 instantiation
# --------------------------------------------------------------------------


def _g1_group(use_pallas: bool = True) -> GroupOps:
    from snarkos_tpu.ops import g1 as g1ops
    from snarkos_tpu.ops import g1_pallas

    def identity(n):
        p = g1ops.infinity((n,))
        return (p.x, p.y, p.z)

    def add(a, b):
        pa = g1ops.JacobianPoints(*a)
        pb = g1ops.JacobianPoints(*b)
        if use_pallas:
            out = g1_pallas.add(pa, pb)
        else:
            out = g1ops.add_impl(pa, pb)
        return (out.x, out.y, out.z)

    def select(mask, a, b):
        out = g1ops.select_points(mask, g1ops.JacobianPoints(*a), g1ops.JacobianPoints(*b))
        return (out.x, out.y, out.z)

    def gather(p, idx):
        return tuple(jnp.take(t, idx, axis=-1) for t in p)

    def seg_combine(a, b):
        if not use_pallas:
            return _default_seg_combine(_g1_group(False))(a, b)
        return g1_pallas.seg_combine(a, b)

    return GroupOps(identity=identity, add=add, select=select, gather=gather,
                    seg_combine=seg_combine)


@functools.partial(jax.jit, static_argnums=(2, 3))
def msm(points, scalar_limbs: jax.Array, c: int = 0, use_pallas: bool = True):
    """MSM over BLS12-377 G1.

    points: JacobianPoints with (L, N) coords (Montgomery); scalar_limbs:
    (16, N) canonical int32 Fr limbs. Returns JacobianPoints batch of 1.
    """
    from snarkos_tpu.ops import g1 as g1ops

    n = scalar_limbs.shape[-1]
    if c == 0:
        c = default_window_bits(n)
    group = _g1_group(use_pallas)
    pts = (points.x, points.y, points.z)
    out = msm_generic(group, pts, scalar_limbs, c)
    return g1ops.JacobianPoints(*out)
