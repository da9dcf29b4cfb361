"""Batched Poseidon sponge over Fr on TPU (BASELINE config #1).

Bit-exact against crypto/ref/poseidon.py. The batch axis is data-parallel
across VPU lanes; rounds run as three ``lax.scan``s (half full / partial /
half full) so the traced graph stays at one-round size. The x^17 s-box is
four squarings and a multiply; the MDS mix is t^2 constant mont_muls.

State layout: (t, L, B) int32 — t state slots of L=16-bit-limb Montgomery
Fr elements over batch B.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from snarkos_tpu.crypto.ref import poseidon as ref
from snarkos_tpu.ops import modarith as fa
from snarkos_tpu.ops.fieldspec import FR

ALPHA = ref.ALPHA
FULL_ROUNDS = ref.FULL_ROUNDS
PARTIAL_ROUNDS = ref.PARTIAL_ROUNDS


@functools.lru_cache(maxsize=None)
def _consts(rate: int):
    """(ark, mds) as Montgomery limb ndarrays: ark (rounds, t, L, 1),
    mds (t, t, L, 1)."""
    ark, mds = ref.poseidon_params(rate)
    t = rate + 1
    rounds = FULL_ROUNDS + PARTIAL_ROUNDS
    ark_arr = np.zeros((rounds, t, FR.nlimbs, 1), dtype=np.int32)
    for r in range(rounds):
        enc = FR.encode(ark[r])  # (L, t)
        ark_arr[r] = enc.T[:, :, None]
    mds_arr = np.zeros((t, t, FR.nlimbs, 1), dtype=np.int32)
    for i in range(t):
        enc = FR.encode(mds[i])
        mds_arr[i] = enc.T[:, :, None]
    with jax.ensure_compile_time_eval():
        return jnp.array(ark_arr), jnp.array(mds_arr)


def _sbox(x: jax.Array) -> jax.Array:
    """x^17 = ((((x^2)^2)^2)^2) * x."""
    y = x
    for _ in range(4):
        y = fa.mont_sqr(FR, y)
    return fa.mont_mul(FR, y, x)


def _mix(state: jax.Array, mds: jax.Array) -> jax.Array:
    """MDS matrix multiply: out_i = sum_j mds[i][j] * s_j."""
    t = state.shape[0]
    rows = []
    for i in range(t):
        acc = None
        for j in range(t):
            term = fa.mont_mul(FR, mds[i, j], state[j])
            acc = term if acc is None else fa.add(FR, acc, term)
        rows.append(acc)
    return jnp.stack(rows, axis=0)


def permute(state: jax.Array, rate: int) -> jax.Array:
    """The Poseidon permutation on (t, L, B) state (Montgomery form)."""
    ark, mds = _consts(rate)
    t = rate + 1
    assert state.shape[0] == t
    half = FULL_ROUNDS // 2

    def full_round(s, ark_r):
        s = jnp.stack([fa.add(FR, s[i], ark_r[i]) for i in range(t)], axis=0)
        s = jnp.stack([_sbox(s[i]) for i in range(t)], axis=0)
        return _mix(s, mds), None

    def partial_round(s, ark_r):
        s = jnp.stack([fa.add(FR, s[i], ark_r[i]) for i in range(t)], axis=0)
        s = jnp.concatenate([_sbox(s[0])[None], s[1:]], axis=0)
        return _mix(s, mds), None

    state, _ = jax.lax.scan(full_round, state, ark[:half])
    state, _ = jax.lax.scan(partial_round, state, ark[half : half + PARTIAL_ROUNDS])
    state, _ = jax.lax.scan(full_round, state, ark[half + PARTIAL_ROUNDS :])
    return state


@functools.partial(jax.jit, static_argnames=("rate", "domain", "num_outputs"))
def hash_fixed(inputs: jax.Array, rate: int, domain: str = "", num_outputs: int = 1) -> jax.Array:
    """Sponge-hash a fixed number of field elements per lane.

    inputs: (n, L, B) Montgomery Fr elements; returns (num_outputs, L, B).
    Mirrors ref.poseidon.hash_many: capacity slot seeded from the domain,
    absorb-by-addition per rate block, permute between blocks.
    """
    n, L, B = inputs.shape
    t = rate + 1
    cap = fa.broadcast_const(FR, ref._domain_to_field(domain), (B,))
    zero = jnp.zeros((L, B), dtype=jnp.int32)
    slots = [cap] + [zero] * rate  # python-level state (no scatter ops)
    pos = 0
    for k in range(n):
        if pos == rate:
            state = permute(jnp.stack(slots, axis=0), rate)
            slots = [state[i] for i in range(t)]
            pos = 0
        slots[1 + pos] = fa.add(FR, slots[1 + pos], inputs[k])
        pos += 1
    outs = []
    state = jnp.stack(slots, axis=0)
    while len(outs) < num_outputs:
        state = permute(state, rate)
        take = min(rate, num_outputs - len(outs))
        outs.extend(state[1 + i] for i in range(take))
    return jnp.stack(outs[:num_outputs], axis=0)


def hash_batch(values: np.ndarray, rate: int = 2, domain: str = "") -> jax.Array:
    """Host helper: (n, L, B) limb array (Montgomery) -> (L, B) digests."""
    return hash_fixed(jnp.asarray(values), rate, domain)[0]
