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

from snarkos_tpu.ops.fieldspec import FQ as fa_FQ

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


def window_digits(scalar_limbs: jax.Array, c: int, num_windows: int | None = None) -> jax.Array:
    """(16, N) canonical Fr limbs -> (W, N) c-bit window digits (LSB window
    first)."""
    nlimbs = scalar_limbs.shape[0]
    if num_windows is None:
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
def _msm_jacobian(points, scalar_limbs: jax.Array, c: int = 0, use_pallas: bool | None = None,
                  chunk_lanes: int = 4096):
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


# --------------------------------------------------------------------------
# fused signed-window engine (round-2 hot path; see ops/msm_pallas.py)
# --------------------------------------------------------------------------


def signed_window_digits(scalar_limbs: jax.Array, c: int) -> jax.Array:
    """(16, N) canonical Fr limbs -> (W, N) PACKED signed window digits.

    Each packed value is ``bucket | (sign << 16)`` with bucket in
    [0, 2^(c-1)] and sign in {0, 1}; the represented digit is
    (-1)^sign * bucket and Sum_w digit_w * 2^(c w) reconstructs the
    scalar. Signed digits halve the bucket count of the unsigned engine,
    so the same bucket-phase cost affords a window ~1 bit wider (fewer
    windows => fewer scan adds). W = ceil(254/c) so the final borrow
    carry is always absorbed by the top window (Fr < 2^253).
    """
    half = 1 << (c - 1)
    full = 1 << c
    num_windows = -(-(SCALAR_BITS + 1) // c)
    raw = window_digits(scalar_limbs, c, num_windows)  # (W, N) in [0, 2^c)

    def step(carry, d):
        t = d + carry
        wrap = t > half
        bucket = jnp.where(wrap, full - t, t)
        sign = wrap.astype(jnp.int32)
        return sign, bucket | (sign << 16)

    carry0 = jnp.zeros(raw.shape[1:], jnp.int32)
    _, packed = jax.lax.scan(step, carry0, raw)
    return packed


def fused_window_bits(n: int) -> int:
    """Window size for the signed fused engine: scan work scales with
    W = ceil(254/c) while the bucket phase scales with 2^(c-1), so larger
    n affords larger c."""
    return max(4, min(16, n.bit_length() - 7))


def _weighted_bucket_total(sums, group: GroupOps, seg, B: int):
    """T_w = Sum_{b>=1} b * S_b over Jacobian bucket sums (3x (L, B)),
    via two chunked inclusive scans + a masked total — ~2B group adds
    instead of the 2 B log B of the double Hillis-Steele suffix scans.

    Identity: T_w = Sum_{b>=1} suffix_b with suffix_b = Sum_{i>=b} S_i.
    Scan 1 computes all suffix_b (scan of the reversed array); scan 2
    totals suffix_(1..B-1) (entries b = 0 and padding masked to the
    identity).  Chains are the jadd_scan virtual-lane layout: chain l
    owns positions [l*mv, (l+1)*mv); cross-chain carries come from a
    Hillis-Steele pass over the (few) chain finals and are folded in
    with one full-width add.
    """
    from snarkos_tpu.ops import msm_pallas

    Kb, Cb = msm_pallas.JADD_LANES, msm_pallas.JADD_CHUNK
    KV = Kb * Cb
    mv = -(-B // KV)
    Bp = KV * mv
    m = mv * Cb
    identB = group.identity(Bp)
    pad = tuple(jnp.concatenate([t[..., ::-1], identB[i][..., : Bp - B]], axis=-1)
                for i, t in enumerate(sums))  # reversed + identity padding

    pos = jnp.arange(Bp, dtype=jnp.int32)
    # virtual-chain layout: flat (j, k) with j = i*Cb + r holds chain
    # (r, k) element i, chain l = r*Kb + k owns run [l*mv, (l+1)*mv)
    j_grid = pos // Kb
    k_grid = pos % Kb
    src = ((j_grid % Cb) * Kb + k_grid) * mv + j_grid // Cb  # (m*Kb,)
    inv = jnp.zeros((Bp,), jnp.int32).at[src].set(pos)

    def chunked_scan_total(vals):
        """-> (per-position inclusive scan values (.., Bp), grand total
        (.., 1)), in ORIGINAL (pre-layout) position order."""
        arranged = tuple(jnp.take(t, src, axis=-1).reshape(t.shape[0], m, Kb)
                         for t in vals)
        s = msm_pallas.jadd_scan(*arranged, Kb, Cb)
        finals = tuple(t[:, -Cb:, :].reshape(t.shape[0], KV) for t in s)
        zero_flag = jnp.zeros((1, KV), jnp.int32)
        summ = _hillis_steele_prefix(seg, group, (zero_flag,) + finals, KV, 3)
        ident1 = group.identity(1)
        carry = tuple(jnp.concatenate([ident1[i], summ[1 + i][..., :-1]], axis=-1)
                      for i in range(3))  # carry INTO chain l
        flat = tuple(t.reshape(t.shape[0], m * Kb) for t in s)
        # position (j, k) belongs to chain (j % Cb)*Kb + k
        chain_idx = ((jnp.arange(m * Kb) // Kb % Cb) * Kb
                     + jnp.arange(m * Kb) % Kb).astype(jnp.int32)
        carry_at = tuple(jnp.take(t, chain_idx, axis=-1) for t in carry)
        fixed = group.add(flat, carry_at)
        total = tuple(t[..., -1:] for t in summ[1:])
        return tuple(jnp.take(t, inv, axis=-1) for t in fixed), total

    suffix_rev, _ = chunked_scan_total(pad)
    # suffix_rev[p] = suffix_{B-1-p} for p < B; mask p >= B-1 (bucket 0
    # and padding) to the identity, then total the rest
    live = jnp.arange(Bp) < (B - 1)
    masked = group.select(live, suffix_rev, group.identity(Bp))
    _, total = chunked_scan_total(masked)
    return total


def _fused_msm_body(x, ycat, packed_digits, c: int, lanes: int, chunk: int,
                    use_pallas: bool, group: GroupOps | None = None,
                    scan_fn=None, fast: bool = False, serial: bool = False,
                    nbatch: int = 1):
    """Window loop of the fused engine. x: (L, N) affine x; ycat: (L, 2N)
    [y | -y]; packed_digits: (W, N). Returns (x, y, z) width-1 tuple, or
    ((x, y, z), exc) with ``fast=True`` — exc is a scalar int32 that is
    nonzero iff any bucket-scan chain in any window hit an exceptional
    (P == ±Q) case, in which case the result is garbage and the caller
    must rerun with ``fast=False`` (see g1.madd_incomplete_impl).

    group/scan_fn are injectable so the combinatorics (signed digits, sort
    relayout, cross-chain carries, bucket-tail fixup) are testable with a
    cheap mock group on CPU (tests/test_msm.py); production uses G1 +
    the fused Pallas bucket scan.  The scan operates on KV = lanes*chunk
    independent virtual chains (msm_pallas module docstring): chain
    l = r*lanes + k owns the contiguous sorted run [l*mv, (l+1)*mv),
    mv = n // KV, and sits at positions (j, k), j = i*chunk + r.  With
    ``serial=True`` (small n) the chains are the K lanes themselves
    (chain k owns [k*m, (k+1)*m), m serial steps — an 8x narrower
    cross-chain fixup, see msm_pallas.SERIAL_MAX_N).

    ``nbatch > 1`` runs a MULTI-MSM: the flattened input holds nbatch
    consecutive segments of n/nbatch elements each (same base points,
    different scalars); element digits are offset into per-segment bucket
    ranges [i*B, (i+1)*B) so ONE sort + ONE scan accumulate all batches,
    the bucket-total suffix scans run SEGMENTED per batch, and the
    accumulator is width-nbatch — amortizing every per-window fixed cost
    (sort, cross-chain carries, doubling chain) across the batch.  This
    is the puzzle prover's shape: B nonces' commit/witness MSMs over the
    same SRS prefix (r4 verdict item 2)."""
    L, n = x.shape
    K = lanes
    m = n // K
    KV = K if serial else K * chunk
    mv = n // KV
    B = (1 << (c - 1)) + 1
    B_total = nbatch * B
    nper = n // nbatch
    # per-element bucket-range offset: element e belongs to batch e//nper
    batch_off = ((jnp.arange(n, dtype=jnp.int32) // nper) * B) if nbatch > 1 else None
    # segment starts for the per-batch suffix scans (flag at b % B == 0)
    seg_flags = (jnp.arange(B_total, dtype=jnp.int32) % B == 0
                 ).astype(jnp.int32)[None] if nbatch > 1 else None
    if group is None:
        group = _g1_group(use_pallas)
        bucket_total = None
    else:
        bucket_total = "generic"
    if scan_fn is None:
        from snarkos_tpu.ops import msm_pallas

        if serial:
            scan_fn = msm_pallas.bucket_scan_serial
        else:
            scan_fn = msm_pallas.bucket_scan_fast if fast else msm_pallas.bucket_scan
    seg = group.seg_combine or _default_seg_combine(group)
    bucket_ids = jnp.arange(B_total, dtype=jnp.int32)

    # static index plumbing for the chain layout
    j_idx = jnp.arange(m, dtype=jnp.int32)[:, None]
    k_idx = jnp.arange(K, dtype=jnp.int32)[None, :]
    if serial:
        src_grid = k_idx * m + j_idx  # (m, K): chain k, element j
    else:
        src_grid = ((j_idx % chunk) * K + k_idx) * mv + j_idx // chunk
    src_flat = src_grid.reshape(-1)

    def plain_add_scan_reverse(vals):
        # nbatch > 1: SEGMENTED per-batch scan (each batch's bucket range
        # is a segment; reversal maps segment boundaries onto themselves)
        rev = tuple(t[..., ::-1] for t in vals)
        flags = seg_flags if nbatch > 1 else jnp.zeros((1, B_total), jnp.int32)
        cur = _hillis_steele_prefix(seg, group, (flags,) + rev, B_total,
                                    len(vals))
        return tuple(t[..., ::-1] for t in cur[1:])

    def window_body(carry, packed):
        acc, exc_acc = carry
        bucket = packed & 0xFFFF
        if nbatch > 1:
            bucket = bucket + batch_off
        sign = packed >> 16
        keys, order = jax.lax.sort(
            (bucket, jnp.arange(n, dtype=jnp.int32)), num_keys=1
        )
        # chain-major relayout fused into the gather
        perm2 = jnp.take(order, src_flat)
        signs2 = jnp.take(sign, perm2)
        xs = jnp.take(x, perm2, axis=-1).reshape(L, m, K)
        ys = jnp.take(ycat, perm2 + signs2 * n, axis=-1).reshape(L, m, K)
        head = jnp.concatenate(
            [jnp.ones((1,), jnp.int32), (keys[1:] != keys[:-1]).astype(jnp.int32)]
        )
        heads_lane = jnp.take(head, src_flat).reshape(m, K)
        if fast:
            nz_lane = jnp.take((keys > 0).astype(jnp.int32), src_flat).reshape(m, K)
            sx, sy, sz, exc = scan_fn(xs, ys, heads_lane[None], nz_lane[None],
                                      K, chunk)
            exc_acc = exc_acc | jnp.max(exc)
        else:
            sx, sy, sz = scan_fn(xs, ys, heads_lane[None], K, chunk)

        # cross-chain carries: inclusive segmented scan of per-chain finals
        if serial:
            chain_flag = jnp.max(heads_lane, axis=0)[None]  # (1, K)
            finals = (sx[:, -1, :], sy[:, -1, :], sz[:, -1, :])
        else:
            # chain l = r*K + k finals live in the last `chunk` rows
            chain_flag = jnp.max(heads_lane.reshape(mv, chunk, K), axis=0).reshape(1, KV)
            finals = tuple(t[:, -chunk:, :].reshape(L, KV) for t in (sx, sy, sz))
        summ = _hillis_steele_prefix(seg, group, (chain_flag,) + finals, KV, 3)
        ident1 = group.identity(1)
        carry_in = tuple(
            jnp.concatenate([ident1[i], summ[1 + i][..., :-1]], axis=-1)
            for i in range(3)
        )  # (L, KV): carry INTO chain l

        # bucket sums = scan values at each bucket's last occurrence, plus
        # the chain carry when the bucket's run extends past a chain start
        pos = jnp.searchsorted(keys, bucket_ids, side="right").astype(jnp.int32) - 1
        nonempty = (pos >= 0) & (jnp.take(keys, jnp.maximum(pos, 0)) == bucket_ids)
        posc = jnp.maximum(pos, 0)
        chain_of = posc // mv
        i_of = posc % mv
        if serial:
            flat = i_of * K + chain_of
            cum_heads = jnp.cumsum(heads_lane, axis=0).reshape(-1)
        else:
            flat = (i_of * chunk + chain_of // K) * K + chain_of % K
            # heads seen within the chain up to each position
            cum_heads = jnp.cumsum(heads_lane.reshape(mv, chunk, K), axis=0).reshape(-1)
        tails = tuple(jnp.take(t.reshape(L, m * K), flat, axis=-1) for t in (sx, sy, sz))
        needs_carry = jnp.take(cum_heads, flat) == 0
        carry_at = tuple(jnp.take(t, chain_of, axis=-1) for t in carry_in)
        added = group.add(tails, carry_at)
        sums = group.select(needs_carry, added, tails)
        live = nonempty & ((bucket_ids % B > 0) if nbatch > 1 else (bucket_ids > 0))
        sums = group.select(live, sums, group.identity(B_total))

        # T_w = Sum_{b>=1} b * S_b.  The chunked-scan path does ~2B adds
        # vs the double Hillis-Steele's 2 B log B, but carries a fixed
        # ~2 log(KV)*KV-add cross-chain cost — a loss below B ~ 2^11.
        if bucket_total is None and B >= (1 << 11) and nbatch == 1:
            t_w = _weighted_bucket_total(sums, group, seg, B)
        else:
            # small-B / mock / multi path: per-batch (suffix of suffix)[1]
            suffix = plain_add_scan_reverse(sums)
            suffix2 = plain_add_scan_reverse(suffix)
            if nbatch > 1:
                slots = jnp.arange(nbatch, dtype=jnp.int32) * B + 1
                t_w = tuple(jnp.take(t, slots, axis=-1) for t in suffix2)
            else:
                t_w = tuple(t[..., 1:2] for t in suffix2)

        def dbl(_, a):
            return group.add(a, a)

        acc = jax.lax.fori_loop(0, c, dbl, acc)
        acc = group.add(acc, t_w)
        return (acc, exc_acc), None

    carry0 = (group.identity(nbatch), jnp.int32(0))
    (acc, exc_total), _ = jax.lax.scan(window_body, carry0, packed_digits[::-1])
    if fast:
        return acc, exc_total
    return acc


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _msm_affine_jit(x: jax.Array, y: jax.Array, scalar_limbs: jax.Array, c: int = 0,
                    lanes: int = 0, chunk: int = 8, use_pallas: bool | None = None,
                    fast: bool = False):
    """Jitted fused signed-window engine. Returns (JacobianPoints, exc):
    exc is a scalar int32, always 0 with ``fast=False``; with ``fast=True``
    nonzero exc means an incomplete-add exception fired and the point is
    garbage (caller falls back — see ``msm_affine``)."""
    from snarkos_tpu.ops import g1 as g1ops
    from snarkos_tpu.ops import modarith as fa
    from snarkos_tpu.ops import msm_pallas

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    n = scalar_limbs.shape[-1]
    serial = n <= msm_pallas.SERIAL_MAX_N
    if serial:
        fast = False  # incomplete-add fast path is a large-N optimization
    if c == 0:
        c = fused_window_bits(n)
    if lanes == 0:
        lanes = min(msm_pallas.LANES, max(128, 1 << (n.bit_length() // 2)))
    tile = lanes * chunk
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        reps = n_pad - n
        x = jnp.concatenate([x, jnp.broadcast_to(x[:, :1], (x.shape[0], reps))], axis=-1)
        y = jnp.concatenate([y, jnp.broadcast_to(y[:, :1], (y.shape[0], reps))], axis=-1)
        scalar_limbs = jnp.concatenate(
            [scalar_limbs, jnp.zeros((scalar_limbs.shape[0], reps), jnp.int32)], axis=-1
        )
    yneg = fa.neg_impl(fa_FQ, y)
    ycat = jnp.concatenate([y, yneg], axis=-1)
    packed = signed_window_digits(scalar_limbs, c)
    if fast:
        out, exc = _fused_msm_body(x, ycat, packed, c, lanes, chunk, use_pallas,
                                   fast=True)
    else:
        out = _fused_msm_body(x, ycat, packed, c, lanes, chunk, use_pallas,
                              serial=serial)
        exc = jnp.int32(0)
    return g1ops.JacobianPoints(*tuple(t[..., :1] for t in out)), exc


def msm_affine(x: jax.Array, y: jax.Array, scalar_limbs: jax.Array, c: int = 0,
               lanes: int = 0, chunk: int = 8, use_pallas: bool | None = None,
               fast: bool | None = None):
    """Fused signed-window MSM over AFFINE points (the hot path).

    x, y: (L, N) affine Montgomery coordinates (points must NOT be the
    identity; zero scalars are fine and land in the discarded 0 bucket).
    Inputs are padded internally to a multiple of lanes*chunk by repeating
    point 0 with scalar 0. Returns a width-1 JacobianPoints.

    The default engine is the incomplete-add fast kernel (11 Fq muls per
    scan add); the exception flag is checked on host and the complete
    engine (17 muls) reruns on a hit — for random bases the rerun never
    triggers, matching how the reference's bases (SRS powers) behave.
    Under an outer trace the host check is impossible, so the complete
    engine is used; pass ``fast=False`` to force it anywhere.
    """
    traced = any(isinstance(t, jax.core.Tracer) for t in (x, y, scalar_limbs))
    if fast is None:
        fast = not traced
    if not fast:
        out, _ = _msm_affine_jit(x, y, scalar_limbs, c, lanes, chunk, use_pallas,
                                 False)
        return out
    out, exc = _msm_affine_jit(x, y, scalar_limbs, c, lanes, chunk, use_pallas,
                               True)
    if int(exc) != 0:
        out, _ = _msm_affine_jit(x, y, scalar_limbs, c, lanes, chunk, use_pallas,
                                 False)
    return out


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _msm_affine_multi_jit(x: jax.Array, y: jax.Array, scalar_limbs: jax.Array,
                          c: int, lanes: int, chunk: int,
                          use_pallas: bool | None):
    """Jitted multi-MSM: x, y (L, N) shared affine base; scalar_limbs
    (16, B, N) canonical Fr limbs. Returns width-B Jacobian coords."""
    from snarkos_tpu.ops import modarith as fa
    from snarkos_tpu.ops import msm_pallas

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    _, nb, npts = scalar_limbs.shape
    if c == 0:
        # per-batch size drives the scan/bucket trade-off, exactly as a
        # single MSM of that size would choose
        c = fused_window_bits(npts)
    if lanes == 0:
        lanes = min(msm_pallas.LANES, max(128, 1 << ((nb * npts).bit_length() // 2)))
    tile = lanes * chunk
    # per-batch padding: total size must tile; padding each batch to a
    # tile multiple keeps every batch segment an identical copy of the
    # padded base (point e%nper with scalar 0 in the pad tail)
    nper = npts if (nb * npts) % tile == 0 else -(-npts // tile) * tile
    reps = nper - npts
    if reps:
        x = jnp.concatenate([x, jnp.broadcast_to(x[:, :1], (x.shape[0], reps))], axis=-1)
        y = jnp.concatenate([y, jnp.broadcast_to(y[:, :1], (y.shape[0], reps))], axis=-1)
        scalar_limbs = jnp.concatenate(
            [scalar_limbs,
             jnp.zeros((scalar_limbs.shape[0], nb, reps), jnp.int32)], axis=-1)
    n = nb * nper
    x = jnp.tile(x, (1, nb))
    yneg = fa.neg_impl(fa_FQ, y)
    ycat = jnp.concatenate([jnp.tile(y, (1, nb)), jnp.tile(yneg, (1, nb))], axis=-1)
    packed = signed_window_digits(scalar_limbs.reshape(scalar_limbs.shape[0], n), c)
    serial = n <= msm_pallas.SERIAL_MAX_N
    out = _fused_msm_body(x, ycat, packed, c, lanes, chunk, use_pallas,
                          serial=serial, nbatch=nb)
    return out


def msm_affine_multi(x: jax.Array, y: jax.Array, scalar_limbs: jax.Array,
                     c: int = 0, lanes: int = 0, chunk: int = 8,
                     use_pallas: bool | None = None):
    """Multi-MSM over a SHARED affine base (the puzzle prover's shape:
    B nonces' commit/witness MSMs over the same SRS prefix — r4 verdict
    item 2). ONE sort/scan/bucket pipeline accumulates every batch by
    offsetting digits into per-batch bucket ranges, so the per-window
    fixed costs (sort, cross-chain Hillis-Steele, the c-doubling Horner
    chain) are paid once for the whole batch instead of once per MSM.

    x, y: (L, N) affine Montgomery base; scalar_limbs: (16, B, N)
    canonical Fr limbs. Returns a width-B JacobianPoints (result i =
    MSM(scalars[:, i], base))."""
    from snarkos_tpu.ops import g1 as g1ops

    out = _msm_affine_multi_jit(x, y, scalar_limbs, c, lanes, chunk,
                                use_pallas)
    return g1ops.JacobianPoints(*out)


def msm_multi(points, scalar_limbs: jax.Array, c: int = 0,
              use_pallas: bool | None = None):
    """Multi-MSM over a shared JacobianPoints base (must be affine,
    z == 1 — SRS powers are). scalar_limbs: (16, B, N)."""
    return msm_affine_multi(points.x, points.y, scalar_limbs, c=c,
                            use_pallas=use_pallas)


def msm(points, scalar_limbs: jax.Array, c: int = 0, use_pallas: bool | None = None,
        chunk_lanes: int = 4096, affine: bool | None = None):
    """MSM over BLS12-377 G1.

    points: JacobianPoints with (L, N) coords (Montgomery); scalar_limbs:
    (16, N) canonical int32 Fr limbs. Returns a JacobianPoints batch of 1.

    Dispatch: when the points are affine (z == 1 everywhere — original
    curve points, the common case for puzzle/KZG bases) the fused
    signed-window engine (msm_affine) runs; otherwise the generic
    windowed-bucket engine. ``affine`` short-circuits the z check — pass
    it explicitly when calling under jit (the auto-check needs a
    concrete z).
    """
    from snarkos_tpu.ops import modarith as fa

    if affine is None:
        if isinstance(points.z, jax.core.Tracer):
            affine = False  # cannot inspect under trace; caller should say
        else:
            one = fa.broadcast_const(fa_FQ, 1, points.z.shape[1:])
            affine = bool(jnp.all(points.z == one))
    if affine:
        return msm_affine(points.x, points.y, scalar_limbs,
                          use_pallas=use_pallas)
    return _msm_jacobian(points, scalar_limbs, c, use_pallas, chunk_lanes)
