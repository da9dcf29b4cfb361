"""Pippenger multi-scalar multiplication on TPU (BASELINE config #3).

The reference reaches MSM through snarkVM's puzzle prove/verify
(SURVEY.md §2.10, node/src/prover/mod.rs:254-258) where it runs on rayon
CPU threads with divergent bucket scatters. That shape is hostile to
SIMD; the TPU-native redesign reformulates bucket accumulation as
sort + segmented-sum (SURVEY.md §7 Phase 4).

Design constraints driving this implementation:
1. Work-optimal bucket accumulation (~2N group adds per window).
2. COMPILE economy: every group add runs through a fused Pallas kernel
   at one of at most THREE fixed lane widths, so Mosaic compiles a
   handful of kernels regardless of N (a naive jax.lax.associative_scan
   instantiates kernels at log2(N) distinct shapes and takes tens of
   minutes to compile).

Pipeline per c-bit window (windows processed high->low via Horner):
  1. digits from scalar limbs                       (vector shifts)
  2. argsort by digit; gather points                (XLA sort + takes)
  3. chunked segmented inclusive scan over sorted points:
     a. view as K lanes x m steps; lax.scan over m: per-lane serial
        segmented scan (fixed (.., K) kernel, compiled once)
     b. cross-lane carry: Hillis-Steele segmented scan over the K lane
        summaries (log2(K) applications of the same kernel)
     c. second m-step pass seeded with the lane carries -> final scan
  4. bucket sums = scan values at segment tails     (searchsorted+gather)
  5. T_w = sum_b b*S_b via a DOUBLE suffix scan over the 2^c buckets
     (sum_b>=1 suffix_b = second-suffix-scan[1])    (fixed-width passes)
  6. acc = 2^c * acc + T_w                          (c doublings)

Generic over a GroupOps so tests validate the combinatorics with a cheap
mock group; G1 uses ops/g1_pallas.py fused kernels. The distributed
version (parallel/msm_dist.py) shards points across chips and reduces
partials over ICI.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp

SCALAR_BITS = 253


# --------------------------------------------------------------------------
# group-ops protocol
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class GroupOps:
    """Abelian group elements as tuples of arrays with trailing axis N."""

    identity: Callable[[int], Any]
    add: Callable[[Any, Any], Any]  # complete, branchless
    select: Callable[[jax.Array, Any, Any], Any]  # mask (n,) ? a : b
    gather: Callable[[Any, jax.Array], Any]
    seg_combine: Callable[[Any, Any], Any] | None = None  # fused (flag,)+elem


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
        bits_have = 16 - sh
        while bits_have < c and k + 1 < nlimbs:
            k += 1
            d = d | (scalar_limbs[k] << bits_have)
            bits_have += 16
        rows.append(d & mask)
    return jnp.stack(rows, axis=0)


# --------------------------------------------------------------------------
# chunked segmented scan (fixed-shape kernels)
# --------------------------------------------------------------------------


def _hillis_steele_prefix(seg, group: GroupOps, state, width: int, nelems: int):
    """Inclusive segmented PREFIX scan over the trailing axis via
    Hillis-Steele, as ONE fori_loop over log2(width) steps with a dynamic
    roll — the combine is traced exactly once (compile economy: the
    unrolled form instantiates log2(width) copies of the full group-add
    graph, which XLA:CPU compiles pathologically slowly).

    state: (flags, *pts) tuple; width = trailing-axis size (power of two
    padding allowed); nelems = len(pts).
    """
    lane_ids = jnp.arange(width)[None, :]
    steps = max(width - 1, 1).bit_length()  # ceil(log2(width))
    pad_pts1 = group.identity(1)  # (..., 1) identity, broadcast against rolls

    def body(i, cur):
        d = jnp.int32(1) << i
        pad_lane = lane_ids < d
        shifted_flag = jnp.where(pad_lane, 1, jnp.roll(cur[0], d, axis=-1))
        shifted_pts = tuple(
            jnp.where(pad_lane, pad_pts1[k], jnp.roll(cur[1 + k], d, axis=-1))
            for k in range(nelems)
        )
        combined = seg((shifted_flag,) + shifted_pts, cur)
        return tuple(
            jnp.where(pad_lane, old, new) for old, new in zip(cur, combined)
        )

    return jax.lax.fori_loop(0, steps, body, tuple(state))


def _seg_scan_chunked(seg, group: GroupOps, flags: jax.Array, pts, K: int):
    """Segmented inclusive scan of (flags, pts) along the trailing axis.

    flags: (1, N) int32 head markers; pts: tuple of (.., N). N % K == 0.
    Returns scanned pts tuple (.., N). ~2N combine applications, all at
    lane width K (plus log2(K) cross-lane applications).
    """
    n = flags.shape[-1]
    m = n // K
    f3 = flags.reshape(1, K, m)
    p3 = tuple(p.reshape(p.shape[0], K, m) for p in pts)
    # leading scan axis = m
    xs = (jnp.moveaxis(f3, -1, 0),) + tuple(jnp.moveaxis(p, -1, 0) for p in p3)

    def step(carry, x):
        out = seg(carry, x)
        return out, None

    def step_emit(carry, x):
        out = seg(carry, x)
        return out, out

    # init flag MUST be 0: the lane aggregate's flag must be the OR of the
    # lane's own head flags (it decides whether cross-lane carries stop
    # here); the identity value makes combine(init, x0) == x0 regardless.
    init = (jnp.zeros((1, K), jnp.int32),) + tuple(group.identity(K))
    # pass 1: per-lane aggregates
    lane_agg, _ = jax.lax.scan(step, init, xs)
    # cross-lane inclusive segmented scan (Hillis-Steele, width K; reuses
    # the SAME fused kernel shape as the m-step passes)
    summaries = _hillis_steele_prefix(seg, group, lane_agg, K, len(pts))
    # carry into lane k = inclusive scan value of lane k-1 (identity for 0)
    carry_flag = jnp.concatenate(
        [jnp.ones((1, 1), jnp.int32), summaries[0][..., :-1]], axis=-1
    )
    carry_pts = tuple(
        jnp.concatenate([group.identity(1)[i], summaries[1 + i][..., :-1]], axis=-1)
        for i in range(len(pts))
    )
    # pass 2: emit final scan values, seeded with the carries
    init2 = (carry_flag,) + carry_pts
    _, ys = jax.lax.scan(step_emit, init2, xs)
    scanned = tuple(jnp.moveaxis(y, 0, -1).reshape(pts[i].shape)
                    for i, y in enumerate(ys[1:]))
    return scanned


# --------------------------------------------------------------------------
# the Pippenger engine
# --------------------------------------------------------------------------


def msm_generic(group: GroupOps, points, scalar_limbs: jax.Array, c: int,
                chunk_lanes: int = 4096):
    """Generic windowed-bucket MSM. points: tuple of (.., N) arrays;
    returns a 1-wide element batch (padded to the kernel lane width)."""
    n = scalar_limbs.shape[-1]
    K = min(chunk_lanes, n)
    num_buckets = 1 << c
    digits = window_digits(scalar_limbs, c)  # (W, N)
    seg = group.seg_combine or _default_seg_combine(group)
    bucket_ids = jnp.arange(num_buckets, dtype=jnp.int32)
    bpos = jnp.arange(num_buckets)

    def plain_add_scan_reverse(vals):
        """Suffix sums over the bucket axis (width 2^c) via Hillis-Steele
        with the same seg kernel (flags = 0 -> plain adds)."""
        rev = tuple(t[..., ::-1] for t in vals)
        flags = jnp.zeros((1, num_buckets), jnp.int32)
        cur = _hillis_steele_prefix(
            seg, group, (flags,) + rev, num_buckets, len(vals)
        )
        return tuple(t[..., ::-1] for t in cur[1:])

    def window_body(acc, digits_w):
        order = jnp.argsort(digits_w)
        keys = digits_w[order]
        pts = group.gather(points, order)
        head = jnp.concatenate(
            [jnp.ones((1,), jnp.int32), (keys[1:] != keys[:-1]).astype(jnp.int32)]
        )[None, :]
        scanned = _seg_scan_chunked(seg, group, head, tuple(pts), K)
        # bucket sums sit at the last occurrence of each key
        pos = jnp.searchsorted(keys, bucket_ids, side="right").astype(jnp.int32) - 1
        nonempty = (pos >= 0) & (jnp.take(keys, jnp.maximum(pos, 0)) == bucket_ids)
        sums = group.gather(scanned, jnp.maximum(pos, 0))
        sums = group.select(nonempty, sums, group.identity(num_buckets))
        # zero out bucket 0 (weight 0)
        sums = group.select(bpos > 0, sums, group.identity(num_buckets))
        # T_w = sum_{b>=1} suffix_b = (suffix of suffix)[1]
        suffix = plain_add_scan_reverse(sums)
        suffix2 = plain_add_scan_reverse(suffix)
        t_w = tuple(t[..., 1:2] for t in suffix2)
        # acc = 2^c * acc + T_w   (single-point ops at a small fixed width)
        def dbl(_, a):
            return group.add(a, a)

        acc = jax.lax.fori_loop(0, c, dbl, acc)
        acc = group.add(acc, t_w)
        return acc, None

    acc0 = group.identity(1)
    acc, _ = jax.lax.scan(window_body, acc0, digits[::-1])
    return acc


def default_window_bits(n: int) -> int:
    """Window size heuristic: c ~ log2(n) - 4, clamped to [4, 13]."""
    return max(4, min(13, n.bit_length() - 4))


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


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def msm(points, scalar_limbs: jax.Array, c: int = 0, use_pallas: bool | None = None,
        chunk_lanes: int = 4096):
    """MSM over BLS12-377 G1.

    points: JacobianPoints with (L, N) coords (Montgomery); scalar_limbs:
    (16, N) canonical int32 Fr limbs. Returns a JacobianPoints batch of 1.
    use_pallas=None resolves at trace time: fused Pallas kernels on TPU,
    plain XLA elsewhere (interpret-mode Pallas is orders of magnitude
    slower than compiled XLA on CPU).
    """
    from snarkos_tpu.ops import g1 as g1ops

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    n = scalar_limbs.shape[-1]
    if c == 0:
        c = default_window_bits(n)
    group = _g1_group(use_pallas)
    pts = (points.x, points.y, points.z)
    out = msm_generic(group, pts, scalar_limbs, c, chunk_lanes)
    return g1ops.JacobianPoints(*tuple(t[..., :1] for t in out))
