"""MSM 2^20 window-size sweep (VERDICT r4 #7: the next measured lever)."""
import sys, time, random
import numpy as np
import jax
from snarkos_tpu.crypto import params
from snarkos_tpu.ops import g1 as g1ops, msm as msm_mod
from snarkos_tpu.ops.fieldspec import FR, FQ

log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
n = 1 << log_n
rng = np.random.default_rng(5)
R = params.FR_MODULUS

# random affine base: k*G for random k via doubling a seed point batch is
# expensive host-side; reuse the dev SRS prefix (real curve points)
from snarkos_tpu.ops.puzzle import PuzzleSRS
srs = PuzzleSRS.dev(12)
# tile the 4097 SRS points up to n (distinct scalars => valid benchmark)
reps = -(-n // srs.points.x.shape[1])
import jax.numpy as jnp
x = jnp.tile(srs.points.x, (1, reps))[:, :n]
y = jnp.tile(srs.points.y, (1, reps))[:, :n]
limbs = jnp.asarray(np.stack([rng.integers(0, 1 << 16, size=n, dtype=np.int32)
                              for _ in range(16)]))
limbs = limbs.at[15].set(limbs[15] & 0x1FFF)  # < 2^253

for c in (0, 13, 14, 15, 16):
    try:
        out = msm_mod.msm_affine(x, y, limbs, c=c)  # warm/compile
        jax.block_until_ready(out.x); np.asarray(out.x)
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = msm_mod.msm_affine(x, y, limbs, c=c)
            np.asarray(out.x)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        label = c if c else "auto"
        print(f"c={label}: {dt:.3f} s -> {n/dt:,.0f} points/s")
    except Exception as exc:
        print(f"c={c}: FAILED {type(exc).__name__}: {str(exc)[:120]}")
