"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: Pippenger MSM throughput (points/s) on BLS12-377 G1 — the
BASELINE.json north-star metric — measured on the attached TPU chip.
Falls back to NTT throughput if the MSM path is unavailable.

``vs_baseline`` is the measured speedup against the pure-Python
arbitrary-precision reference implementation on this host (the reference
repo publishes no benchmark numbers — BASELINE.md), estimated from a
small calibration run of crypto/ref/g1.msm.

Environment knobs:
  SNARKOS_TPU_BENCH_LOG_N   (default 16)  -> MSM size 2^N
  SNARKOS_TPU_BENCH_WINDOW  (default 12)  -> Pippenger window bits
  SNARKOS_TPU_BENCH_PHASE   msm|ntt|poseidon (default msm)
"""

import json
import os
import sys
import time

import numpy as np


def _setup_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return jax


def bench_poseidon(jax, log_n: int = 16):
    import jax.numpy as jnp

    from snarkos_tpu.ops import poseidon as poseidon_ops
    from snarkos_tpu.ops.fieldspec import FR

    n = 1 << log_n
    rng = np.random.default_rng(0)
    inputs = jnp.stack([jnp.array(FR.random(n, rng)) for _ in range(2)], axis=0)

    out = poseidon_ops.hash_fixed(inputs, rate=2)
    np.asarray(out)  # force full completion (remote platforms lazily block)
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        out = poseidon_ops.hash_fixed(inputs, rate=2)
        np.asarray(out[:, :, :1])  # fetch a sliver -> true completion fence
    dt = (time.time() - t0) / iters
    return n / dt, "hashes/s", n


def bench_ntt(jax, log_n: int = 18):
    import jax.numpy as jnp

    from snarkos_tpu.ops import ntt as ntt_ops
    from snarkos_tpu.ops.fieldspec import FR

    n = 1 << log_n
    rng = np.random.default_rng(0)
    a = jnp.array(FR.random(n, rng))
    out = ntt_ops.ntt(a)
    np.asarray(out)
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        out = ntt_ops.ntt(out)
        np.asarray(out[:, :1])  # completion fence
    dt = (time.time() - t0) / iters
    return n / dt, "elems/s", n


def _bench_points(log_n: int):
    """(x, y) Montgomery limb arrays of 2^log_n pseudo-random affine
    points k_i*G (64-bit splitmix64 multipliers from the native
    fixed-base engine, native/g1_msm.cpp), .cache'd to disk.

    Structure-free multipliers matter: the incomplete-add fast kernel
    (ops/msm_pallas.py) relies on P == ±Q bucket collisions being
    improbable, which holds for SRS-like bases (powers of tau) but NOT
    for small-index bases like (i+1)*G, where subset sums of small
    indices collide and constantly force the complete-engine fallback.
    """
    from snarkos_tpu.crypto import params
    from snarkos_tpu.crypto.ref import g1 as ref
    from snarkos_tpu.ops.fieldspec import FQ
    from snarkos_tpu.utils import native

    n = 1 << log_n
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"bench_pts_rnd_{log_n}.npz")
    if os.path.exists(path):
        data = np.load(path)
        return data["x"], data["y"]

    raw = native.g1_fixed_base_gen(20240 + log_n, n)
    if raw is not None:
        # (n, 12) canonical u64 -> (24, n) canonical 16-bit limbs (a pure
        # byte repack), then one device mont-mul by R^2 per chunk.
        import jax.numpy as jnp

        from snarkos_tpu.ops import modarith as fa_ops

        u16 = raw.view("<u2").reshape(n, 48)
        x_can = np.ascontiguousarray(u16[:, :24].T).astype(np.int32)
        y_can = np.ascontiguousarray(u16[:, 24:].T).astype(np.int32)
        xs_out = np.empty((FQ.nlimbs, n), np.int32)
        ys_out = np.empty((FQ.nlimbs, n), np.int32)
        chunk = 1 << 20
        for lo in range(0, n, chunk):
            hi = min(n, lo + chunk)
            xs_out[:, lo:hi] = np.asarray(fa_ops.to_mont(FQ, jnp.asarray(x_can[:, lo:hi])))
            ys_out[:, lo:hi] = np.asarray(fa_ops.to_mont(FQ, jnp.asarray(y_can[:, lo:hi])))
        np.savez(path, x=xs_out, y=ys_out)
        return xs_out, ys_out

    # fallback without the native engine: incremental (i+1)*G chord walk
    # (correct but structured — the fast engine will fall back; slow).
    q = params.FQ_MODULUS
    xs_out = np.empty((FQ.nlimbs, n), np.int32)
    ys_out = np.empty((FQ.nlimbs, n), np.int32)
    acc = ref.GENERATOR
    chunk = 1 << 18
    done = 0
    while done < n:
        take = min(chunk, n - done)
        jac = []
        for _ in range(take):
            jac.append(acc)
            acc = ref.add(acc, ref.GENERATOR)
        # batch-normalize the chunk: one inversion for all z
        zs = [p[2] for p in jac]
        prefix = [1] * (take + 1)
        for i, z in enumerate(zs):
            prefix[i + 1] = prefix[i] * z % q
        inv = pow(prefix[-1], -1, q)
        ax, ay = [0] * take, [0] * take
        for i in range(take - 1, -1, -1):
            zi = prefix[i] * inv % q
            inv = inv * zs[i] % q
            zi2 = zi * zi % q
            ax[i] = jac[i][0] * zi2 % q
            ay[i] = jac[i][1] * zi2 % q * zi % q
        xs_out[:, done:done + take] = np.asarray(FQ.encode_fast(ax, mont=True))
        ys_out[:, done:done + take] = np.asarray(FQ.encode_fast(ay, mont=True))
        done += take
    np.savez(path, x=xs_out, y=ys_out)
    return xs_out, ys_out


def bench_msm(jax, log_n: int = 20, c: int = 0):
    """Fused signed-window MSM over distinct affine points (the
    production path, incomplete-add fast kernel).

    Sizes above 2^22 run as linear 2^22 partials + width-1 Jacobian adds:
    a single 2^24 dispatch's sorted copies + 3-coordinate scan outputs at
    24 int32 limbs exceed HBM, and chunking preserves the rate (the
    per-chunk pipeline is unchanged)."""
    import jax.numpy as jnp

    from snarkos_tpu.ops import g1 as g1ops
    from snarkos_tpu.ops import msm as msm_mod
    from snarkos_tpu.ops.fieldspec import FR

    n = 1 << log_n
    chunk_log = min(log_n, 22)
    m = 1 << chunk_log
    rng = np.random.default_rng(0)
    bx, by = _bench_points(chunk_log)
    x = jnp.asarray(bx)
    y = jnp.asarray(by)
    scalar_chunks = [jnp.asarray(FR.random(m, rng)) for _ in range(n // m)]

    def run():
        total = None
        for sc in scalar_chunks:  # same points per chunk: scalars differ,
            out = msm_mod.msm_affine(x, y, sc, c=c)
            total = out if total is None else g1ops.add(total, out)
        np.asarray(total.x[:, :1])  # completion fence

    run()  # warm
    iters = 3 if log_n <= 20 else 2
    t0 = time.time()
    for _ in range(iters):
        run()
    dt = (time.time() - t0) / iters
    return n / dt, "points/s", n


def bench_prover(jax, batch: int = 8):
    """Prover solutions/s at nonce batch B — STEADY-STATE throughput.

    The warm-up must run the FULL batch shape: a batch-1 warm-up leaves
    the (L, B, K) epoch-program and batch-MSM graphs uncompiled, so the
    timed run measures one-time compilation instead of throughput (the
    r4 "regression" 0.517 -> 0.194 sol/s was exactly this artifact; the
    reference prover runs the same shapes continuously,
    node/src/prover/mod.rs:174-235, so steady state is the honest
    number — BENCH_NOTES.md prover section)."""
    from snarkos_tpu.ops.puzzle import global_puzzle

    pz = global_puzzle()
    nonces = list(range(1, batch + 1))
    pz.prove_batch(b"\x01" * 32, "aleo1benchprover", nonces, None)  # warm
    iters = 2
    t0 = time.time()
    for it in range(iters):
        sols = pz.prove_batch(b"\x01" * 32, "aleo1benchprover",
                              [n + (it + 1) * batch for n in nonces], None)
        assert len(sols) == batch
    dt = (time.time() - t0) / iters
    return batch / dt


def _native_ref_msm_rate(mt: bool = False) -> float | None:
    """Calibrate the native C++ Pippenger (points/s at 2^14) — the honest
    CPU baseline (same class of implementation as the reference's
    arkworks backend).  ``mt=True`` uses all hardware threads (the
    reference machine would further scale by its core count)."""
    import random

    from snarkos_tpu.crypto import params
    from snarkos_tpu.utils import native

    n = 1 << 14
    raw = native.g1_fixed_base_gen(11, n)
    if raw is None:
        return None
    pts = []
    for i in range(n):
        x = sum(int(raw[i][j]) << (64 * j) for j in range(6))
        y = sum(int(raw[i][6 + j]) << (64 * j) for j in range(6))
        pts.append((x, y))
    rng = random.Random(0)
    scalars = [rng.randrange(params.FR_MODULUS) for _ in range(n)]
    t0 = time.time()
    out = (native.g1_msm_mt(scalars, pts) if mt
           else native.g1_msm(scalars, pts))
    if out is None:
        return None
    return n / (time.time() - t0)


def _python_ref_msm_rate() -> float:
    """Pure-Python bigint MSM rate (fallback calibration)."""
    import random

    from snarkos_tpu.crypto.ref import g1 as ref
    from snarkos_tpu.crypto import params

    rng = random.Random(0)
    k = 32
    pts = [ref.scalar_mul(i + 1, ref.GENERATOR) for i in range(k)]
    scalars = [rng.randrange(params.FR_MODULUS) for _ in range(k)]
    t0 = time.time()
    ref.msm(scalars, pts)
    dt = time.time() - t0
    return k / dt


def main():
    jax = _setup_jax()
    phase = os.environ.get("SNARKOS_TPU_BENCH_PHASE", "msm")
    log_n = int(os.environ.get("SNARKOS_TPU_BENCH_LOG_N", "20"))
    window = int(os.environ.get("SNARKOS_TPU_BENCH_WINDOW", "0"))

    extras = {}
    try:
        pose_rate, _, pose_n = bench_poseidon(jax, min(log_n, 16))
        extras["poseidon_hashes_per_s"] = round(pose_rate)
    except Exception as exc:  # pragma: no cover
        extras["poseidon_error"] = str(exc)[:200]
    try:
        ntt_rate, _, ntt_n = bench_ntt(jax, min(log_n + 2, 22))
        extras["ntt_elems_per_s"] = round(ntt_rate)
        extras["ntt_size"] = ntt_n
    except Exception as exc:  # pragma: no cover
        extras["ntt_error"] = str(exc)[:200]
    if os.environ.get("SNARKOS_TPU_BENCH_PROVER", "1") == "1":
        try:
            extras["prover_solutions_per_s_b8"] = round(bench_prover(jax, 8), 3)
            extras["prover_solutions_per_s_b16"] = round(bench_prover(jax, 16), 3)
        except Exception as exc:  # pragma: no cover
            extras["prover_error"] = str(exc)[:200]

    metric, value, unit = None, None, None
    if phase == "msm":
        try:
            rate, unit, n = bench_msm(jax, log_n, window)
            metric, value = f"msm_points_per_s_2^{log_n}", rate
        except Exception as exc:
            extras["msm_error"] = str(exc)[:200]
        # BASELINE.md headline size: 2^24 (chunked 2^22 partials)
        if value is not None and log_n < 24 and \
                os.environ.get("SNARKOS_TPU_BENCH_24", "1") == "1":
            try:
                rate24, _, _ = bench_msm(jax, 24, window)
                extras["msm_points_per_s_2^24"] = round(rate24)
            except Exception as exc:  # pragma: no cover
                extras["msm24_error"] = str(exc)[:200]
    if value is None and "ntt_elems_per_s" in extras:
        metric, value, unit = f"ntt_elems_per_s_2^{min(log_n + 2, 22)}", extras["ntt_elems_per_s"], "elems/s"
    if value is None and "poseidon_hashes_per_s" in extras:
        metric, value, unit = "poseidon_hashes_per_s_2^16", extras["poseidon_hashes_per_s"], "hashes/s"
    if value is None:
        print(json.dumps({"metric": "bench_failed", "value": 0, "unit": "n/a",
                          "vs_baseline": 0.0, "extras": extras}))
        return 1

    ref_rate = None
    if "msm" in (metric or ""):
        try:
            ref_rate = _native_ref_msm_rate()
            extras["baseline"] = "native C++ Pippenger, 1 thread, 2^14"
        except Exception:
            ref_rate = None
        try:
            mt_rate = _native_ref_msm_rate(mt=True)
            if mt_rate is not None:
                extras["baseline_mt_points_per_s"] = round(mt_rate)
                extras["baseline_mt"] = "native C++ Pippenger, all hw threads, 2^14"
        except Exception:
            pass
        if ref_rate is None:
            try:
                ref_rate = _python_ref_msm_rate()
                extras["baseline"] = "pure-Python MSM"
            except Exception:
                ref_rate = None
    vs_baseline = round(value / ref_rate, 2) if ref_rate else 1.0

    print(json.dumps({
        "metric": metric,
        "value": round(float(value), 2),
        "unit": unit,
        "vs_baseline": vs_baseline,
        "extras": extras,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
