"""Distributed kernels on the virtual 8-device CPU mesh: four-step NTT
(all_to_all stage exchange) and the sharded MSM skeleton."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import ntt as ref_ntt
from snarkos_tpu.ops.fieldspec import FR
from snarkos_tpu.parallel import ntt_dist
from snarkos_tpu.parallel.mesh import make_mesh, shard_last

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    len(jax.local_devices(backend="cpu")) < 4,
    reason="needs the 8-device virtual CPU mesh",
)]


def test_ntt_dist_matches_reference():
    import random

    rng = random.Random(11)
    n = 256
    mesh = make_mesh(4, backend="cpu")
    vals = [rng.randrange(params.FR_MODULUS) for _ in range(n)]
    a = shard_last(mesh, jnp.array(FR.encode(vals)))
    out = ntt_dist.ntt_dist(a, mesh)
    got = FR.decode_fast(np.asarray(out))
    # decode_fast returns canonical ints of the raw limbs; convert Montgomery
    got = [v * FR.mont_rinv % FR.p for v in got]
    assert got == ref_ntt.ntt(vals)


def test_ntt_dist_roundtrip():
    import random

    rng = random.Random(12)
    n = 256
    mesh = make_mesh(4, backend="cpu")
    vals = [rng.randrange(params.FR_MODULUS) for _ in range(n)]
    a = shard_last(mesh, jnp.array(FR.encode(vals)))
    back = ntt_dist.intt_dist(ntt_dist.ntt_dist(a, mesh), mesh)
    got = [v * FR.mont_rinv % FR.p for v in FR.decode_fast(np.asarray(back))]
    assert got == vals


def test_msm_dist_mock_sharding():
    """The msm_dist reduction skeleton with the mock group, 8 devices."""
    from snarkos_tpu.ops import msm as msm_mod

    MOD = 1_000_003

    def mock():
        def identity(k):
            return (jnp.zeros((1, k), jnp.int32),)

        def add(a, b):
            return (((a[0].astype(jnp.int64) + b[0].astype(jnp.int64)) % MOD).astype(jnp.int32),)

        def select(m, a, b):
            return (jnp.where(m[None], a[0], b[0]),)

        def gather(p, i):
            return tuple(jnp.take(t, i, axis=-1) for t in p)

        return msm_mod.GroupOps(identity=identity, add=add, select=select, gather=gather)

    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    group = mock()
    mesh = make_mesh(8, backend="cpu")
    rng = np.random.default_rng(5)
    n = 128
    scalars = [int(v) for v in rng.integers(1, 1 << 40, n)]
    xs = rng.integers(0, MOD, (1, n)).astype(np.int32)
    sc = jax.device_put(jnp.array(FR.encode_fast(scalars)), NamedSharding(mesh, P(None, "x")))
    pts = jax.device_put(jnp.array(xs), NamedSharding(mesh, P(None, "x")))

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(None, "x"), P(None, "x")),
        out_specs=P(None, None), check_vma=False,
    )
    def sharded(p_l, s_l):
        partial = msm_mod.msm_generic(group, (p_l,), s_l, c=4, chunk_lanes=16)
        gathered = jax.lax.all_gather(partial[0], "x", axis=-1, tiled=True)
        total = gathered
        width = total.shape[-1]
        while width > 1:
            half = width // 2
            total = ((total[..., :half].astype(jnp.int64)
                      + total[..., half: 2 * half].astype(jnp.int64)) % MOD).astype(jnp.int32)
            width = half
        return total

    out = int(np.asarray(sharded(pts, sc))[0, 0])
    expect = sum(k * int(x) for k, x in zip(scalars, xs[0])) % MOD
    assert out == expect


def test_msm_dist_real_g1():
    """REAL BLS12-377 G1 points through the production msm_dist path on a
    4-device mesh (VERDICT r1 item 4: the real-field multi-device MSM had
    never been executed)."""
    import random

    from snarkos_tpu.crypto.ref import g1 as ref_g1
    from snarkos_tpu.ops import g1 as g1ops
    from snarkos_tpu.parallel import msm_dist

    rng = random.Random(99)
    mesh = make_mesh(4, backend="cpu")
    n = 8
    scalars = [rng.randrange(params.FR_MODULUS) for _ in range(n)]
    scalars[3] = 0  # zero-scalar lane on a shard
    pts = [ref_g1.scalar_mul(rng.randrange(1, 1 << 48), ref_g1.GENERATOR)
           for _ in range(n)]
    enc = g1ops.encode_points(pts)
    limbs = jnp.array(FR.encode(scalars, mont=False))
    out = msm_dist.msm_dist(enc, limbs, mesh, c=4, use_pallas=False)
    got = ref_g1.affine(g1ops.decode_points(
        g1ops.JacobianPoints(out.x[..., :1], out.y[..., :1], out.z[..., :1]))[0])
    assert got == ref_g1.affine(ref_g1.msm(scalars, pts))
