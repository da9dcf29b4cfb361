"""Real-G1 multi-MSM vs per-batch reference + batched prover timing (TPU)."""
import time, random
import numpy as np
from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import g1 as ref_g1
from snarkos_tpu.ops import g1 as g1ops, msm as msm_mod
from snarkos_tpu.ops.fieldspec import FR

rng = random.Random(3)
R = params.FR_MODULUS
N, B = 300, 3
pts = [ref_g1.affine(ref_g1.scalar_mul(rng.randrange(1, R), ref_g1.GENERATOR)) for _ in range(N)]
jac = [ref_g1.from_affine(p) for p in pts]
enc = g1ops.encode_points(jac)
scalars = [[rng.randrange(R) for _ in range(N)] for _ in range(B)]
limbs = np.stack([np.asarray(FR.encode_fast(s)) for s in scalars], axis=1)
out = msm_mod.msm_affine_multi(enc.x, enc.y, limbs)
got = g1ops.decode_points(out)
for i in range(B):
    want = ref_g1.msm(scalars[i], jac)
    assert ref_g1.affine(got[i]) == ref_g1.affine(want), f"batch {i} mismatch"
print("multi-MSM real-G1 OK (N=300, B=3)")

from snarkos_tpu.ops.puzzle import global_puzzle
pz = global_puzzle()
for batch in (8, 16):
    nonces = list(range(1, batch + 1))
    pz.prove_batch(b"\x01" * 32, "aleo1multiprof", nonces, None)  # warm
    t0 = time.perf_counter()
    for it in (1, 2):
        sols = pz.prove_batch(b"\x01" * 32, "aleo1multiprof",
                              [n + it * batch for n in nonces], None)
        assert len(sols) == batch
    dt = (time.perf_counter() - t0) / 2
    print(f"prove_batch B={batch}: {dt*1000:.0f} ms -> {batch/dt:.3f} sol/s")
# cross-check solutions verify
sol = sols[0]
ok = pz.verify(b"\x01"*32, "aleo1multiprof", 2*16+1, sol.commitment, sol.eval_y, sol.witness, None)
print("solution verifies:", ok)
