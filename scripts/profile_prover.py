"""Stage-by-stage prover profile at K=2^12 (VERDICT r4 item 2)."""
import time, sys
import jax

from snarkos_tpu.ops.puzzle import global_puzzle, _slice_points, _g1_to_bytes
from snarkos_tpu.ops import msm as msm_mod, kzg as kzg_ops, g1 as g1ops, modarith as fa
from snarkos_tpu.ops.fieldspec import FR


def sync(x):
    jax.tree_util.tree_map(lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, x)
    return x


def t(label, fn, reps=3):
    fn()  # warm
    best = min(sync(fn) or time.perf_counter() - s for s in [time.perf_counter()] for _ in [0]) if False else None
    times = []
    for _ in range(reps):
        s = time.perf_counter()
        sync(fn())
        times.append(time.perf_counter() - s)
    print(f"{label:42s} {min(times)*1000:9.1f} ms")
    return min(times)


B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
pz = global_puzzle()
k = pz.k
eh = b"\x01" * 32
nonces = list(range(1, B + 1))
print(f"K=2^{pz.log_degree}, B={B}")

# end-to-end
s = time.perf_counter(); pz.prove_batch(eh, "aleo1profile", nonces[:1], None); print(f"cold 1-nonce: {time.perf_counter()-s:.1f} s")
for _ in range(2):
    s = time.perf_counter(); sols = pz.prove_batch(eh, "aleo1profile", nonces, None); e2e = time.perf_counter() - s
print(f"prove_batch B={B}: {e2e*1000:.0f} ms -> {B/e2e:.3f} sol/s")

seeds = [pz._seed_field(eh, "aleo1profile", n) for n in nonces]
prog = pz.epoch_program(eh)
leaves = sync(pz._leaves_device(seeds))
t("coeffs (epoch program)", lambda: prog.apply(leaves))
all_coeffs = sync(prog.apply(leaves))
pts = _slice_points(pz.srs.points, k)
canon = [sync(fa.from_mont(FR, all_coeffs[:, i, :])) for i in range(B)]
t("from_mont x B", lambda: [fa.from_mont(FR, all_coeffs[:, i, :]) for i in range(B)])
t("commit MSM x B", lambda: [msm_mod.msm(pts, canon[i]) for i in range(B)])
commits = [sync(msm_mod.msm(pts, canon[i])) for i in range(B)]
t("decode commit x B", lambda: [g1ops.decode_points(c)[0] for c in commits])
cb = [_g1_to_bytes(g1ops.decode_points(c)[0]) for c in commits]
zs = [pz._challenge(x) for x in cb]
t("challenge (host poseidon) x B", lambda: [pz._challenge(x) for x in cb], reps=1)
t("open_at x B", lambda: [kzg_ops.open_at(pts, all_coeffs[:, i, :], zs[i]) for i in range(B)])
# msm engine comparison at 2^12
import snarkos_tpu.ops.msm_pallas as mp
t("msm 2^12 serial engine (1)", lambda: msm_mod.msm(pts, canon[0]))
orig = mp.SERIAL_MAX_N
mp.SERIAL_MAX_N = 1
try:
    t("msm 2^12 WIDE engine (1)", lambda: msm_mod.msm(pts, canon[0]))
finally:
    mp.SERIAL_MAX_N = orig
