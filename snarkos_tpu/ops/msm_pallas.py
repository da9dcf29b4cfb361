"""Fused Pallas segmented-scan kernel for MSM bucket accumulation.

This is the round-2 MSM hot path (BASELINE config #3; the reference
reaches MSM through snarkVM's puzzle prove, node/src/prover/mod.rs:254-258,
as a rayon bucket scatter). Design deltas vs the round-1 engine in
ops/msm.py:

1. ONE pallas_call per window instead of one per scan step: the serial
   per-lane segmented scan runs INSIDE the kernel (fori over CHUNK steps
   per grid step) with the running carry held in VMEM scratch across the
   sequential TPU grid.  Round 1 paid one XLA dispatch per scan step
   (m = N/K dispatches per window); this pays m/CHUNK grid steps of a
   single fused kernel — dispatch overhead gone, every intermediate in
   VMEM.
2. The combine is the complete MIXED add (g1.madd_impl, ~17 Fq muls):
   scan inputs are original MSM points, i.e. affine (z = 1), so the
   Jacobian-Jacobian complete add (~23 muls) is never needed in the hot
   loop.
3. Single scan pass + carry fixup: round 1 ran the scan twice (aggregate
   pass + emit pass).  Here the kernel emits per-position scan values in
   the same pass; segments that cross a lane boundary are repaired only
   at the bucket-tail read positions, using the cross-lane carries
   (log2(K) Hillis-Steele combines) and a cumulative-OR head mask.
   ~N group adds per window instead of ~2N.

Layout (round 4): the sorted points arrive as (L, m, K) limb tensors
carved into K*CHUNK independent VIRTUAL scan chains — virtual lane
l = r*K + k (r = j % CHUNK) owns the contiguous sorted run
[l*mv, (l+1)*mv), mv = m/CHUNK, and position (j, k) with j = i*CHUNK + r
holds element i of chain (r, k).  Each grid step performs ONE group add
over the whole (L, CHUNK, K) block — CHUNK*K lanes of independent work
per VPU op — instead of CHUNK serial adds at K lanes.  The round-3
kernel was dependency-latency-bound at ~0.5 int-op/cycle; the widened
block raises ILP ~CHUNK-fold at identical VMEM block shapes (bigger
K alone blows the ~16 MiB VMEM budget, and Mosaic requires the
second-minor block dim divisible by 8, so CHUNK cannot shrink).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snarkos_tpu.ops import g1
from snarkos_tpu.ops.fieldspec import FQ

_L = FQ.nlimbs

# K lanes x CHUNK chunk-rows per block; the block's CHUNK*K positions are
# independent chains (one madd per grid step).  VMEM at (24, 8, 512)
# blocks: 5 coord blocks double-buffered (~3.8 MiB) + (3, 24, 8, 512)
# carry (~1.2 MiB) + ~10 live madd temporaries (~3.8 MiB) ≈ 10 MiB —
# inside the 16 MiB budget (K=1024 blocks measured 19.3 MiB: OOM).
LANES = 512
CHUNK = 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _scan_kernel(one_ref, xs_ref, ys_ref, fl_ref, ox_ref, oy_ref, oz_ref, carry_ref):
    """Inclusive segmented scan over CHUNK*K independent virtual chains:
    ONE complete mixed add per grid step on the full (L, CHUNK, K) block.

    carry_ref (3, L, CHUNK, K) persists across the sequential grid; z = 0
    marks the identity so x/y init values are irrelevant (madd selects
    on z).
    """

    @pl.when(pl.program_id(0) == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    one = one_ref[...][:, None, :]  # (L, 1, K) broadcasts over CHUNK
    qx = xs_ref[...]
    qy = ys_ref[...]
    reset = fl_ref[...] != 0  # (1, CHUNK, K)
    p = g1.JacobianPoints(carry_ref[0], carry_ref[1], carry_ref[2])
    out = g1.madd_impl(p, qx, qy, one=one)
    out_x = jnp.where(reset, qx, out.x)
    out_y = jnp.where(reset, qy, out.y)
    out_z = jnp.where(reset, jnp.broadcast_to(one, qx.shape), out.z)
    carry_ref[0], carry_ref[1], carry_ref[2] = out_x, out_y, out_z
    ox_ref[...] = out_x
    oy_ref[...] = out_y
    oz_ref[...] = out_z


def _scan_kernel_fast(one_ref, xs_ref, ys_ref, fl_ref, nz_ref,
                      ox_ref, oy_ref, oz_ref, oexc_ref, carry_ref, exc_ref):
    """Incomplete-add variant of ``_scan_kernel``: the combine is
    ``g1.madd_incomplete_impl`` (11 Fq muls vs ~17), exceptional lanes
    (P == ±Q inside a segment) raise a sticky per-chain flag instead of
    being patched. ``oexc_ref`` maps every grid step to the same
    (1, CHUNK, K) block, so the value left after the final step is the
    accumulated OR.

    ``nz_ref`` masks the flag to positions in NONZERO buckets: bucket 0
    (zero digits — zero scalars and pad lanes, typically N copies of one
    point, i.e. guaranteed P == Q hits) is discarded downstream, and its
    corruption cannot cross a segment head into a live bucket — the scan
    resets at every head and the cross-chain carry scan is segmented, so
    garbage stays within the bucket-0 segment. Exceptional outputs are
    still canonical field elements (h == 0 forces z3 == 0 exactly), so
    no overflow hazard propagates either.
    """

    @pl.when(pl.program_id(0) == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)
        exc_ref[...] = jnp.zeros_like(exc_ref)

    one = one_ref[...][:, None, :]
    qx = xs_ref[...]
    qy = ys_ref[...]
    reset = fl_ref[...] != 0  # (1, CHUNK, K)
    p = g1.JacobianPoints(carry_ref[0], carry_ref[1], carry_ref[2])
    out, exc = g1.madd_incomplete_impl(p, qx, qy, one=one)
    # a segment head overwrites the combine, so its exception is moot
    live = jnp.logical_and(~reset, nz_ref[...] != 0)
    exc_ref[...] |= jnp.where(live, exc[None].astype(jnp.int32), 0)
    out_x = jnp.where(reset, qx, out.x)
    out_y = jnp.where(reset, qy, out.y)
    out_z = jnp.where(reset, jnp.broadcast_to(one, qx.shape), out.z)
    carry_ref[0], carry_ref[1], carry_ref[2] = out_x, out_y, out_z
    ox_ref[...] = out_x
    oy_ref[...] = out_y
    oz_ref[...] = out_z
    oexc_ref[...] = exc_ref[...]


@functools.partial(jax.jit, static_argnums=(4, 5))
def bucket_scan_fast(xs: jax.Array, ys: jax.Array, flags: jax.Array,
                     nonzero: jax.Array, lanes: int = LANES, chunk: int = CHUNK):
    """Incomplete-add segmented scan. Same contract as ``bucket_scan``
    plus a ``nonzero`` input ((1, m, K) int32, 1 where the position's
    bucket key is > 0) and a fourth output ``exc``: (1, chunk, K) int32,
    nonzero in chains that hit an exceptional case in a live bucket
    (their scan values are garbage — the caller must detect this and
    fall back to the complete engine)."""
    L, m, K = xs.shape
    assert K == lanes and m % chunk == 0, (xs.shape, lanes, chunk)
    from snarkos_tpu.ops import modarith as fa

    one = fa.broadcast_const(FQ, 1, (K,))
    coord = pl.BlockSpec((L, chunk, K), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    flag = pl.BlockSpec((1, chunk, K), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    onespec = pl.BlockSpec((L, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
    excspec = pl.BlockSpec((1, chunk, K), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, m, K), jnp.int32)
    exc_shape = jax.ShapeDtypeStruct((1, chunk, K), jnp.int32)

    with fa.unrolled_muls():
        sx, sy, sz, exc = pl.pallas_call(
            _scan_kernel_fast,
            grid=(m // chunk,),
            in_specs=[onespec, coord, coord, flag, flag],
            out_specs=[coord] * 3 + [excspec],
            out_shape=[shape] * 3 + [exc_shape],
            scratch_shapes=[pltpu.VMEM((3, L, chunk, K), jnp.int32),
                            pltpu.VMEM((1, chunk, K), jnp.int32)],
            interpret=_interpret(),
        )(one, xs, ys, flags, nonzero)
    return sx, sy, sz, exc


@functools.partial(jax.jit, static_argnums=(3, 4))
def bucket_scan(xs: jax.Array, ys: jax.Array, flags: jax.Array,
                lanes: int = LANES, chunk: int = CHUNK):
    """Segmented inclusive scan of affine points over chunk*K virtual
    chains (see module docstring for the chain layout).

    xs, ys: (L, m, K) sorted affine coordinates (Montgomery limbs);
    flags: (1, m, K) int32 segment-head markers. m % chunk == 0.
    Returns (sx, sy, sz): (L, m, K) Jacobian scan values.
    """
    L, m, K = xs.shape
    assert K == lanes and m % chunk == 0, (xs.shape, lanes, chunk)
    from snarkos_tpu.ops import modarith as fa

    one = fa.broadcast_const(FQ, 1, (K,))
    coord = pl.BlockSpec((L, chunk, K), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    flag = pl.BlockSpec((1, chunk, K), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    onespec = pl.BlockSpec((L, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, m, K), jnp.int32)

    # unrolled multiplies in the kernel body for BOTH paths: Mosaic wants
    # the flat op stream, and the interpret path cannot use the rolled
    # form (its jnp modulus constants would be captured by the kernel,
    # which pallas rejects). Interpret compiles are slow but .jax_cache'd.
    with fa.unrolled_muls():
        sx, sy, sz = pl.pallas_call(
            _scan_kernel,
            grid=(m // chunk,),
            in_specs=[onespec, coord, coord, flag],
            out_specs=[coord] * 3,
            out_shape=[shape] * 3,
            scratch_shapes=[pltpu.VMEM((3, L, chunk, K), jnp.int32)],
            interpret=_interpret(),
        )(one, xs, ys, flags)
    return sx, sy, sz


# --- serial-chain kernels (small-N engine) ----------------------------------
#
# For small MSMs (the puzzle prover's 2^12 commits/opens) the wide layout
# degenerates: KV = K*CHUNK chains leave <= 1 element per chain and push
# ALL the combining into the cross-chain Hillis-Steele pass (log KV steps
# x KV-wide group adds per window, the per-window fixed cost that
# dominated the r3 prover at 0.5 sol/s).  The serial kernels keep ONE
# chain per lane (K chains, m serial steps — the r3 layout), an 8x
# narrower fixup, and are selected by ops/msm.py below SERIAL_MAX_N.

SERIAL_MAX_N = 1 << 15


def _scan_kernel_serial(one_ref, xs_ref, ys_ref, fl_ref, ox_ref, oy_ref,
                        oz_ref, carry_ref):
    """Per-lane serial segmented scan: chain k owns sorted run
    [k*m, (k+1)*m); CHUNK steps per grid invocation; carry (3, L, K)."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    one = one_ref[...]

    def body(j, _):
        qx = xs_ref[:, j, :]
        qy = ys_ref[:, j, :]
        reset = fl_ref[:, j, :] != 0  # (1, K)
        p = g1.JacobianPoints(carry_ref[0], carry_ref[1], carry_ref[2])
        out = g1.madd_impl(p, qx, qy, one=one)
        out_x = jnp.where(reset, qx, out.x)
        out_y = jnp.where(reset, qy, out.y)
        out_z = jnp.where(reset, one, out.z)
        carry_ref[0], carry_ref[1], carry_ref[2] = out_x, out_y, out_z
        ox_ref[:, j, :] = out_x
        oy_ref[:, j, :] = out_y
        oz_ref[:, j, :] = out_z
        return 0

    jax.lax.fori_loop(0, xs_ref.shape[1], body, 0)


@functools.partial(jax.jit, static_argnums=(3, 4))
def bucket_scan_serial(xs: jax.Array, ys: jax.Array, flags: jax.Array,
                       lanes: int = LANES, chunk: int = CHUNK):
    """Serial-chain variant of ``bucket_scan`` (K chains of m steps)."""
    L, m, K = xs.shape
    assert K == lanes and m % chunk == 0, (xs.shape, lanes, chunk)
    from snarkos_tpu.ops import modarith as fa

    one = fa.broadcast_const(FQ, 1, (K,))
    coord = pl.BlockSpec((L, chunk, K), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    flag = pl.BlockSpec((1, chunk, K), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    onespec = pl.BlockSpec((L, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, m, K), jnp.int32)
    with fa.unrolled_muls():
        return pl.pallas_call(
            _scan_kernel_serial,
            grid=(m // chunk,),
            in_specs=[onespec, coord, coord, flag],
            out_specs=[coord] * 3,
            out_shape=[shape] * 3,
            scratch_shapes=[pltpu.VMEM((3, L, K), jnp.int32)],
            interpret=_interpret(),
        )(one, xs, ys, flags)


# --- plain Jacobian scan (bucket-phase suffix sums) -------------------------

JADD_LANES = 128
JADD_CHUNK = 8


def _jadd_scan_kernel(xs_ref, ys_ref, zs_ref, ox_ref, oy_ref, oz_ref, carry_ref):
    """Plain (unsegmented) inclusive scan of JACOBIAN points over chunk*K
    virtual chains — the complete add handles identities (z = 0), so no
    flags are needed.  Used by the MSM bucket phase to turn the
    work-inefficient width-B Hillis-Steele suffix scans (B log B adds)
    into chunked scans (~B adds)."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    p = g1.JacobianPoints(carry_ref[0], carry_ref[1], carry_ref[2])
    q = g1.JacobianPoints(xs_ref[...], ys_ref[...], zs_ref[...])
    out = g1.add_impl(p, q)
    carry_ref[0], carry_ref[1], carry_ref[2] = out.x, out.y, out.z
    ox_ref[...] = out.x
    oy_ref[...] = out.y
    oz_ref[...] = out.z


@functools.partial(jax.jit, static_argnums=(3, 4))
def jadd_scan(xs: jax.Array, ys: jax.Array, zs: jax.Array,
              lanes: int = JADD_LANES, chunk: int = JADD_CHUNK):
    """Inclusive scan of (L, m, K) Jacobian points over chunk*K virtual
    chains (same layout contract as ``bucket_scan``).  Returns the
    per-position scan values (3 arrays of (L, m, K))."""
    L, m, K = xs.shape
    assert K == lanes and m % chunk == 0, (xs.shape, lanes, chunk)
    from snarkos_tpu.ops import modarith as fa

    coord = pl.BlockSpec((L, chunk, K), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, m, K), jnp.int32)
    with fa.unrolled_muls():
        return pl.pallas_call(
            _jadd_scan_kernel,
            grid=(m // chunk,),
            in_specs=[coord] * 3,
            out_specs=[coord] * 3,
            out_shape=[shape] * 3,
            scratch_shapes=[pltpu.VMEM((3, L, chunk, K), jnp.int32)],
            interpret=_interpret(),
        )(xs, ys, zs)
