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

Layout: the sorted points arrive as (L, m, K) limb tensors where lane k
owns the contiguous sorted run [k*m, (k+1)*m) and position (j, k) holds
sorted index k*m + j.  The grid walks j in CHUNK-sized blocks; K rides
the 128-lane axis.
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

# K lanes x CHUNK serial steps per grid invocation. VMEM at (24, 8, 1024)
# blocks: ~1.6 MiB in + ~2.4 MiB out (x2 double-buffered) + ~0.3 MiB carry
# + madd temporaries — comfortably inside the ~16 MiB/core budget.
LANES = 1024
CHUNK = 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _scan_kernel(one_ref, xs_ref, ys_ref, fl_ref, ox_ref, oy_ref, oz_ref, carry_ref):
    """Per-lane inclusive segmented scan, CHUNK serial steps per grid step.

    carry_ref (3, L, K) persists across the sequential grid; z = 0 marks
    the identity so x/y init values are irrelevant (madd selects on z).
    """

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


def _scan_kernel_fast(one_ref, xs_ref, ys_ref, fl_ref, nz_ref,
                      ox_ref, oy_ref, oz_ref, oexc_ref, carry_ref, exc_ref):
    """Incomplete-add variant of ``_scan_kernel``: the combine is
    ``g1.madd_incomplete_impl`` (11 Fq muls vs ~17), exceptional lanes
    (P == ±Q inside a segment) raise a sticky per-lane flag instead of
    being patched. ``oexc_ref`` maps every grid step to the same (1, K)
    block, so the value left after the final step is the accumulated OR.

    ``nz_ref`` masks the flag to positions in NONZERO buckets: bucket 0
    (zero digits — zero scalars and pad lanes, typically N copies of one
    point, i.e. guaranteed P == Q hits) is discarded downstream, and its
    corruption cannot cross a segment head into a live bucket — the scan
    resets at every head and the cross-lane carry scan is segmented, so
    garbage stays within the bucket-0 segment. Exceptional outputs are
    still canonical field elements (h == 0 forces z3 == 0 exactly), so
    no overflow hazard propagates either.
    """

    @pl.when(pl.program_id(0) == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)
        exc_ref[...] = jnp.zeros_like(exc_ref)

    one = one_ref[...]

    def body(j, _):
        qx = xs_ref[:, j, :]
        qy = ys_ref[:, j, :]
        reset = fl_ref[:, j, :] != 0  # (1, K)
        p = g1.JacobianPoints(carry_ref[0], carry_ref[1], carry_ref[2])
        out, exc = g1.madd_incomplete_impl(p, qx, qy, one=one)
        # a segment head overwrites the combine, so its exception is moot
        live = jnp.logical_and(~reset, nz_ref[:, j, :] != 0)
        exc_ref[...] |= jnp.where(live, exc[None].astype(jnp.int32), 0)
        out_x = jnp.where(reset, qx, out.x)
        out_y = jnp.where(reset, qy, out.y)
        out_z = jnp.where(reset, one, out.z)
        carry_ref[0], carry_ref[1], carry_ref[2] = out_x, out_y, out_z
        ox_ref[:, j, :] = out_x
        oy_ref[:, j, :] = out_y
        oz_ref[:, j, :] = out_z
        return 0

    jax.lax.fori_loop(0, xs_ref.shape[1], body, 0)
    oexc_ref[...] = exc_ref[...]


@functools.partial(jax.jit, static_argnums=(4, 5))
def bucket_scan_fast(xs: jax.Array, ys: jax.Array, flags: jax.Array,
                     nonzero: jax.Array, lanes: int = LANES, chunk: int = CHUNK):
    """Incomplete-add segmented scan. Same contract as ``bucket_scan``
    plus a ``nonzero`` input ((1, m, K) int32, 1 where the position's
    bucket key is > 0) and a fourth output ``exc``: (1, K) int32, nonzero
    in lanes that hit an exceptional case in a live bucket (their scan
    values are garbage — the caller must detect this and fall back to the
    complete engine)."""
    L, m, K = xs.shape
    assert K == lanes and m % chunk == 0, (xs.shape, lanes, chunk)
    from snarkos_tpu.ops import modarith as fa

    one = fa.broadcast_const(FQ, 1, (K,))
    coord = pl.BlockSpec((L, chunk, K), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    flag = pl.BlockSpec((1, chunk, K), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    onespec = pl.BlockSpec((L, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
    excspec = pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, m, K), jnp.int32)
    exc_shape = jax.ShapeDtypeStruct((1, K), jnp.int32)

    with fa.unrolled_muls():
        sx, sy, sz, exc = pl.pallas_call(
            _scan_kernel_fast,
            grid=(m // chunk,),
            in_specs=[onespec, coord, coord, flag, flag],
            out_specs=[coord] * 3 + [excspec],
            out_shape=[shape] * 3 + [exc_shape],
            scratch_shapes=[pltpu.VMEM((3, L, K), jnp.int32),
                            pltpu.VMEM((1, K), jnp.int32)],
            interpret=_interpret(),
        )(one, xs, ys, flags, nonzero)
    return sx, sy, sz, exc


@functools.partial(jax.jit, static_argnums=(3, 4))
def bucket_scan(xs: jax.Array, ys: jax.Array, flags: jax.Array,
                lanes: int = LANES, chunk: int = CHUNK):
    """Segmented inclusive scan of affine points along the sorted axis.

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
            scratch_shapes=[pltpu.VMEM((3, L, K), jnp.int32)],
            interpret=_interpret(),
        )(one, xs, ys, flags)
    return sx, sy, sz
