"""Fused Pallas TPU kernels for G1 point addition.

Why Pallas here: a complete Jacobian add is ~16 Fq mont_muls, i.e. tens of
thousands of int32 lane ops once limb-unrolled. The MSM segmented scan
instantiates the combine ~2*log2(N) times; as plain XLA that is a
multi-million-node graph, while as a Pallas kernel each combine is ONE
custom call with every intermediate held in VMEM (no HBM round-trips
between the 16 muls). The kernel bodies reuse the pure ``*_impl`` field
ops from ops/modarith.py — bit-exactness is inherited.

On non-TPU backends the kernels run in Pallas interpreter mode (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from snarkos_tpu.ops import g1
from snarkos_tpu.ops.fieldspec import FQ

LANE_TILE = 512  # lanes per grid step; multiple of 128
_L = FQ.nlimbs


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _coord_spec():
    return pl.BlockSpec((_L, LANE_TILE), lambda i: (0, i))


def _flag_spec():
    return pl.BlockSpec((1, LANE_TILE), lambda i: (0, i))


def _pad_lanes(arr: jax.Array, n_pad: int, fill: int) -> jax.Array:
    if arr.shape[-1] == n_pad:
        return arr
    pad = jnp.full(arr.shape[:-1] + (n_pad - arr.shape[-1],), fill, dtype=arr.dtype)
    return jnp.concatenate([arr, pad], axis=-1)


def _pad_points(p: g1.JacobianPoints, n_pad: int) -> g1.JacobianPoints:
    # padding lanes are the identity (x=y=mont 1, z=0)
    n = p.x.shape[-1]
    if n == n_pad:
        return p
    from snarkos_tpu.ops import modarith as fa

    one = fa.broadcast_const(FQ, 1, (n_pad - n,))
    return g1.JacobianPoints(
        x=jnp.concatenate([p.x, one], axis=-1),
        y=jnp.concatenate([p.y, one], axis=-1),
        z=jnp.concatenate([p.z, jnp.zeros_like(one)], axis=-1),
    )


# --- plain complete add -----------------------------------------------------


def _add_kernel(ax, ay, az, bx, by, bz, ox, oy, oz):
    pa = g1.JacobianPoints(ax[:], ay[:], az[:])
    pb = g1.JacobianPoints(bx[:], by[:], bz[:])
    out = g1.add_impl(pa, pb)
    ox[:], oy[:], oz[:] = out.x, out.y, out.z


@jax.jit
def add(pa: g1.JacobianPoints, pb: g1.JacobianPoints) -> g1.JacobianPoints:
    """Complete Jacobian add over (L, N) coordinate batches, fused."""
    n = pa.x.shape[-1]
    n_pad = -(-n // LANE_TILE) * LANE_TILE
    pa, pb = _pad_points(pa, n_pad), _pad_points(pb, n_pad)
    shape = jax.ShapeDtypeStruct((_L, n_pad), jnp.int32)
    from snarkos_tpu.ops import modarith as fa

    with fa.unrolled_muls():
        ox, oy, oz = pl.pallas_call(
            _add_kernel,
            grid=(n_pad // LANE_TILE,),
            in_specs=[_coord_spec()] * 6,
            out_specs=[_coord_spec()] * 3,
            out_shape=[shape] * 3,
            interpret=_interpret(),
        )(pa.x, pa.y, pa.z, pb.x, pb.y, pb.z)
    return g1.JacobianPoints(ox[:, :n], oy[:, :n], oz[:, :n])


# --- segmented-scan combine -------------------------------------------------


def _seg_kernel(fa_, ax, ay, az, fb_, bx, by, bz, of, ox, oy, oz):
    pa = g1.JacobianPoints(ax[:], ay[:], az[:])
    pb = g1.JacobianPoints(bx[:], by[:], bz[:])
    s = g1.add_impl(pa, pb)
    keep_b = fb_[0, :] != 0
    out = g1.select_points(keep_b, pb, s)
    of[:] = fa_[:] | fb_[:]
    ox[:], oy[:], oz[:] = out.x, out.y, out.z


@jax.jit
def seg_combine(a, b):
    """Segmented-sum combine: a, b are (flag (1,N), x, y, z) tuples where
    flag marks segment heads; returns the combined element."""
    fa_, ax, ay, az = a
    fb_, bx, by, bz = b
    n = ax.shape[-1]
    n_pad = -(-n // LANE_TILE) * LANE_TILE
    pa = _pad_points(g1.JacobianPoints(ax, ay, az), n_pad)
    pb = _pad_points(g1.JacobianPoints(bx, by, bz), n_pad)
    fa_p = _pad_lanes(fa_, n_pad, 1)
    fb_p = _pad_lanes(fb_, n_pad, 1)
    cshape = jax.ShapeDtypeStruct((_L, n_pad), jnp.int32)
    fshape = jax.ShapeDtypeStruct((1, n_pad), jnp.int32)
    from snarkos_tpu.ops import modarith as fa

    with fa.unrolled_muls():
        of, ox, oy, oz = pl.pallas_call(
            _seg_kernel,
            grid=(n_pad // LANE_TILE,),
            in_specs=[_flag_spec()] + [_coord_spec()] * 3 + [_flag_spec()] + [_coord_spec()] * 3,
            out_specs=[_flag_spec()] + [_coord_spec()] * 3,
            out_shape=[fshape] + [cshape] * 3,
            interpret=_interpret(),
        )(fa_p, pa.x, pa.y, pa.z, fb_p, pb.x, pb.y, pb.z)
    return (of[:, :n], ox[:, :n], oy[:, :n], oz[:, :n])
