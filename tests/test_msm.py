"""MSM: machinery validated with a cheap mock group, then real G1 at small N."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from snarkos_tpu.crypto import params
from snarkos_tpu.ops import msm as msm_mod
from snarkos_tpu.ops.fieldspec import FR

pytestmark = pytest.mark.slow  # device-op tier: XLA:CPU compile-heavy (README two-tier run)

RNG = random.Random(1234)

MOCK_MOD = 1_000_000_007


def _mock_group():
    """Integers mod MOCK_MOD as the 'curve': same combinatorics, cheap ops.
    Elements: single (1, N) int32 array tuples."""

    def identity(n):
        return (jnp.zeros((1, n), jnp.int32),)

    def add(a, b):
        return (((a[0].astype(jnp.int64) + b[0]) % MOCK_MOD).astype(jnp.int32),)

    def select(mask, a, b):
        return (jnp.where(mask[None], a[0], b[0]),)

    def gather(p, idx):
        return tuple(jnp.take(t, idx, axis=-1) for t in p)

    return msm_mod.GroupOps(identity=identity, add=add, select=select, gather=gather)


def test_window_digits():
    scalars = [0, 1, params.FR_MODULUS - 1, RNG.randrange(params.FR_MODULUS)]
    limbs = jnp.array(FR.encode(scalars, mont=False))
    for c in [4, 7, 13, 16]:
        digits = np.asarray(msm_mod.window_digits(limbs, c))
        for lane, s in enumerate(scalars):
            recon = 0
            for w in range(digits.shape[0]):
                recon |= int(digits[w, lane]) << (w * c)
            assert recon == s, f"c={c} lane={lane}"


@pytest.mark.parametrize("c", [4, 8])
@pytest.mark.parametrize("n", [1, 7, 64])
def test_msm_machinery_mock_group(c, n):
    """sum_i k_i * x_i over Z_p with the full Pippenger pipeline."""
    scalars = [RNG.randrange(params.FR_MODULUS) for _ in range(n)]
    xs = [RNG.randrange(MOCK_MOD) for _ in range(n)]
    limbs = jnp.array(FR.encode(scalars, mont=False))
    pts = (jnp.array(xs, dtype=jnp.int32).reshape(1, n),)
    out = msm_mod.msm_generic(_mock_group(), pts, limbs, c)
    got = int(np.asarray(out[0])[0, 0])
    expect = sum(k * x for k, x in zip(scalars, xs)) % MOCK_MOD
    assert got == expect


def test_signed_window_digits():
    """Packed signed digits reconstruct the scalar: sum (-1)^s * b * 2^(cw)."""
    scalars = [0, 1, params.FR_MODULUS - 1, RNG.randrange(params.FR_MODULUS),
               (1 << 252) - 1]
    limbs = jnp.array(FR.encode(scalars, mont=False))
    for c in [4, 5, 8, 13]:
        packed = np.asarray(msm_mod.signed_window_digits(limbs, c))
        half = 1 << (c - 1)
        for lane, s in enumerate(scalars):
            recon = 0
            for w in range(packed.shape[0]):
                bucket = int(packed[w, lane]) & 0xFFFF
                sign = int(packed[w, lane]) >> 16
                assert 0 <= bucket <= half, f"c={c} w={w}"
                recon += (-bucket if sign else bucket) << (w * c)
            assert recon == s, f"c={c} lane={lane}"


def _mock3_group():
    """Z_M^3 with componentwise addition as a stand-in for (x, y, z)
    Jacobian states: exercises every combinatorial path of the fused
    engine (sort relayout, cross-lane carries, bucket-tail fixup,
    signed-digit windows) without field arithmetic."""

    def identity(n):
        return tuple(jnp.zeros((1, n), jnp.int32) for _ in range(3))

    def add(a, b):
        return tuple(((x.astype(jnp.int64) + y) % MOCK_MOD).astype(jnp.int32)
                     for x, y in zip(a, b))

    def select(mask, a, b):
        return tuple(jnp.where(mask[None], x, y) for x, y in zip(a, b))

    def gather(p, idx):
        return tuple(jnp.take(t, idx, axis=-1) for t in p)

    return msm_mod.GroupOps(identity=identity, add=add, select=select, gather=gather)


def _mock3_scan(xs, ys, flags, lanes, chunk):
    """Segmented inclusive scan over chunk*K virtual chains (the round-4
    kernel layout: chain (r, k) advances along i at rows j = i*chunk + r).
    Input point (x, y) contributes (x, y, 1)."""
    L, m, K = xs.shape
    mv = m // chunk
    outs = []
    for v in (xs, ys, jnp.ones_like(xs)):
        vv = v.reshape(L, mv, chunk, K)
        fl = flags.reshape(1, mv, chunk, K)
        carry = jnp.zeros((L, chunk, K), jnp.int64)
        rows = []
        for i in range(mv):
            reset = fl[:, i] != 0
            carry = jnp.where(reset, vv[:, i].astype(jnp.int64),
                              (carry + vv[:, i]) % MOCK_MOD)
            rows.append(carry)
        outs.append(jnp.stack(rows, axis=1).reshape(L, m, K).astype(jnp.int32))
    return tuple(outs)


def _mock3_scan_serial(xs, ys, flags, lanes, chunk):
    """Serial-chain mock scan: chain k owns rows j = 0..m-1 of lane k
    (the small-N engine layout)."""
    L, m, K = xs.shape
    outs = []
    for v in (xs, ys, jnp.ones_like(xs)):
        carry = jnp.zeros((L, K), jnp.int64)
        rows = []
        for j in range(m):
            reset = flags[:, j, :] != 0
            carry = jnp.where(reset, v[:, j, :].astype(jnp.int64),
                              (carry + v[:, j, :]) % MOCK_MOD)
            rows.append(carry)
        outs.append(jnp.stack(rows, axis=1).astype(jnp.int32))
    return tuple(outs)


@pytest.mark.parametrize("serial", [False, True])
@pytest.mark.parametrize("c", [4, 6])
@pytest.mark.parametrize("n,lanes,chunk", [(16, 4, 2), (64, 8, 4), (100, 4, 2)])
def test_fused_engine_mock_group(c, n, lanes, chunk, serial):
    """The fused signed-window engine computes sum_i k_i * y_i in the
    y-component of the mock group (signs enter via the [y | -y] gather),
    in both the wide-chain and serial-chain layouts."""
    scalars = [RNG.randrange(params.FR_MODULUS) for _ in range(n)]
    scalars[0] = 0
    ys = [RNG.randrange(1, MOCK_MOD) for _ in range(n)]
    xs = [RNG.randrange(1, MOCK_MOD) for _ in range(n)]
    tile = lanes * chunk
    n_pad = -(-n // tile) * tile
    xs_p = xs + [xs[0]] * (n_pad - n)
    ys_p = ys + [ys[0]] * (n_pad - n)
    sc_p = scalars + [0] * (n_pad - n)
    x_arr = jnp.array(xs_p, jnp.int32).reshape(1, n_pad)
    ycat = jnp.array(ys_p + [(MOCK_MOD - y) % MOCK_MOD for y in ys_p],
                     jnp.int32).reshape(1, 2 * n_pad)
    limbs = jnp.array(FR.encode(sc_p, mont=False))
    packed = msm_mod.signed_window_digits(limbs, c)
    out = msm_mod._fused_msm_body(
        x_arr, ycat, packed, c, lanes, chunk, use_pallas=False,
        group=_mock3_group(),
        scan_fn=_mock3_scan_serial if serial else _mock3_scan, serial=serial)
    got_y = int(np.asarray(out[1])[0, 0])
    expect_y = sum(k * y for k, y in zip(scalars, ys)) % MOCK_MOD
    assert got_y == expect_y


@pytest.mark.slow
def test_msm_g1_small():
    """Real G1 MSM at tiny size vs the reference (Pallas interpret mode)."""
    from snarkos_tpu.crypto.ref import g1 as ref
    from snarkos_tpu.ops import g1 as g1ops

    n, c = 8, 8
    scalars = [RNG.randrange(params.FR_MODULUS) for _ in range(n)]
    scalars[0] = 0  # zero-scalar lane
    pts_ref = [ref.scalar_mul(RNG.randrange(1, 1 << 64), ref.GENERATOR) for _ in range(n)]
    pts_ref[1] = ref.INFINITY  # identity lane
    enc = g1ops.encode_points(pts_ref)
    limbs = jnp.array(FR.encode(scalars, mont=False))
    out = msm_mod.msm(enc, limbs, c)
    got = g1ops.decode_points(out)[0]
    expect = ref.msm(scalars, pts_ref)
    assert ref.affine(got) == ref.affine(expect)


@pytest.mark.slow
def test_msm_affine_fast_g1():
    """The incomplete-add fast engine (interpret mode) matches the
    reference on random-multiple bases with NO exception raised — the
    production case (SRS powers)."""
    from snarkos_tpu.crypto.ref import g1 as ref
    from snarkos_tpu.ops import g1 as g1ops
    from snarkos_tpu.ops.fieldspec import FQ

    n = 16
    scalars = [RNG.randrange(params.FR_MODULUS) for _ in range(n)]
    scalars[3] = 0  # zero-scalar lane -> discarded bucket 0
    pts_ref = [ref.scalar_mul(RNG.randrange(1, params.FR_MODULUS), ref.GENERATOR)
               for _ in range(n)]
    aff = [ref.affine(p) for p in pts_ref]
    x = jnp.array(FQ.encode([a[0] for a in aff], mont=True))
    y = jnp.array(FQ.encode([a[1] for a in aff], mont=True))
    limbs = jnp.array(FR.encode(scalars, mont=False))

    out, exc = msm_mod._msm_affine_jit(x, y, limbs, 4, 8, 2, False, True)
    # input pads to 8*2 with copies of point 0 at scalar 0: bucket-0
    # exceptions are masked, so the flag must stay clear here
    assert int(exc) == 0
    got = g1ops.decode_points(out)[0]
    expect = ref.msm(scalars, pts_ref)
    assert ref.affine(got) == ref.affine(expect)


@pytest.mark.slow
def test_msm_affine_exception_fallback():
    """Duplicate bases in the SAME live bucket force a P == Q hit: the
    fast engine must raise exc, and the public msm_affine wrapper must
    fall back to the complete engine and still return the right answer."""
    from snarkos_tpu.crypto.ref import g1 as ref
    from snarkos_tpu.ops import g1 as g1ops
    from snarkos_tpu.ops.fieldspec import FQ

    n = 16
    base = ref.scalar_mul(12345, ref.GENERATOR)
    pts_ref = [base] * 2 + [
        ref.scalar_mul(RNG.randrange(1, params.FR_MODULUS), ref.GENERATOR)
        for _ in range(n - 2)
    ]
    scalars = [1, 1] + [RNG.randrange(params.FR_MODULUS) for _ in range(n - 2)]
    aff = [ref.affine(p) for p in pts_ref]
    x = jnp.array(FQ.encode([a[0] for a in aff], mont=True))
    y = jnp.array(FQ.encode([a[1] for a in aff], mont=True))
    limbs = jnp.array(FR.encode(scalars, mont=False))

    _, exc = msm_mod._msm_affine_jit(x, y, limbs, 4, 8, 2, False, True)
    assert int(exc) != 0

    out = msm_mod.msm_affine(x, y, limbs, c=4, lanes=8, chunk=2,
                             use_pallas=False)
    got = g1ops.decode_points(out)[0]
    expect = ref.msm(scalars, pts_ref)
    assert ref.affine(got) == ref.affine(expect)


@pytest.mark.parametrize("serial", [False, True])
@pytest.mark.parametrize("nbatch,c,nper,lanes,chunk",
                         [(2, 4, 16, 4, 2), (3, 6, 64, 8, 4),
                          (4, 4, 20, 4, 2)])
def test_fused_engine_multi_mock_group(nbatch, c, nper, lanes, chunk, serial):
    """nbatch > 1 multi-MSM (shared base, per-batch bucket ranges): each
    batch's y-component total matches its own scalar set (r5: the puzzle
    prover's batched commit/witness MSM shape)."""
    tile = lanes * chunk
    nper_pad = nper if (nbatch * nper) % tile == 0 else -(-nper // tile) * tile
    scalars = [[RNG.randrange(params.FR_MODULUS) for _ in range(nper)]
               for _ in range(nbatch)]
    scalars[0][0] = 0
    xs = [RNG.randrange(1, MOCK_MOD) for _ in range(nper)]
    ys = [RNG.randrange(1, MOCK_MOD) for _ in range(nper)]
    xs_p = xs + [xs[0]] * (nper_pad - nper)
    ys_p = ys + [ys[0]] * (nper_pad - nper)
    n = nbatch * nper_pad
    x_arr = jnp.array(xs_p * nbatch, jnp.int32).reshape(1, n)
    y_tiled = ys_p * nbatch
    ycat = jnp.array(y_tiled + [(MOCK_MOD - y) % MOCK_MOD for y in y_tiled],
                     jnp.int32).reshape(1, 2 * n)
    sc_flat = []
    for s in scalars:
        sc_flat += s + [0] * (nper_pad - nper)
    limbs = jnp.array(FR.encode(sc_flat, mont=False))
    packed = msm_mod.signed_window_digits(limbs, c)
    out = msm_mod._fused_msm_body(
        x_arr, ycat, packed, c, lanes, chunk, use_pallas=False,
        group=_mock3_group(),
        scan_fn=_mock3_scan_serial if serial else _mock3_scan, serial=serial,
        nbatch=nbatch)
    got = np.asarray(out[1])[0]
    for i in range(nbatch):
        expect = sum(k * y for k, y in zip(scalars[i], ys)) % MOCK_MOD
        assert int(got[i]) == expect, f"batch {i}"


def test_weighted_bucket_total_mock(monkeypatch):
    """r4 advisory (low): the chunked-scan bucket-total path (production
    only, B >= 2^11) exercised on CPU — inject a mock jadd_scan so the
    virtual-chain src/inv permutation and carry plumbing are covered."""
    from snarkos_tpu.ops import msm_pallas

    def mock_jadd_scan(xs, ys, zs, lanes, chunk):
        L, m, K = xs.shape
        mv = m // chunk
        outs = []
        for v in (xs, ys, zs):
            vv = v.reshape(L, mv, chunk, K).astype(jnp.int64)
            carry = jnp.zeros((L, chunk, K), jnp.int64)
            rows = []
            for i in range(mv):
                carry = (carry + vv[:, i]) % MOCK_MOD
                rows.append(carry)
            outs.append(jnp.stack(rows, axis=1).reshape(L, m, K).astype(jnp.int32))
        return tuple(outs)

    monkeypatch.setattr(msm_pallas, "jadd_scan", mock_jadd_scan)
    group = _mock3_group()
    seg = msm_mod._default_seg_combine(group)
    B = (1 << 11) + 1  # production threshold shape
    comps = [[RNG.randrange(MOCK_MOD) for _ in range(B)] for _ in range(3)]
    sums = tuple(jnp.array(c, jnp.int32).reshape(1, B) for c in comps)
    total = msm_mod._weighted_bucket_total(sums, group, seg, B)
    for i in range(3):
        expect = sum(b * v for b, v in enumerate(comps[i]) if b >= 1) % MOCK_MOD
        assert int(np.asarray(total[i])[0, 0]) == expect, f"component {i}"
