"""Systematic async-race stress tests (SURVEY §5 'race/sanitizer
discipline'): hammer the consensus intake, propose, and commit paths
concurrently and assert the safety invariants that the reference protects
with locks (commit-race lock in bft.rs:38-43, propose_lock, storage
atomics)."""

import asyncio
import random

import pytest

from snarkos_tpu.node.types import Solution, TX_SOLUTION

from tests.common_bft import TestNetwork


async def _run_until(cond, timeout=75.0, interval=0.1):
    loop = asyncio.get_event_loop()
    deadline = loop.time() + timeout
    while loop.time() < deadline:
        if cond():
            return True
        await asyncio.sleep(interval)
    return False


def _sol(i: int, net) -> Solution:
    return Solution(
        epoch_hash=b"\x01" * 32, address=next(iter(net.nodes)), nonce=i,
        commitment=bytes(97), eval_y=i, witness=bytes(97),
    )


@pytest.mark.asyncio
async def test_concurrent_intake_during_consensus():
    """Many tasks firing transmissions into every node WHILE the BFT
    commits: no divergence, no duplicate commits, no lost invariants."""
    net = TestNetwork(4)
    net.connect_all()
    await net.start()
    rng = random.Random(5)

    async def cannon(offset):
        for i in range(25):
            sol = _sol(offset * 1000 + i, net)
            for node in net.nodes.values():
                try:
                    await node.primary.process_unconfirmed_solution(sol)
                except Exception:
                    pass
            await asyncio.sleep(rng.random() * 0.05)

    try:
        cannons = [asyncio.create_task(cannon(k)) for k in range(6)]
        ok = await _run_until(lambda: net.max_committed_height() >= 3)
        for t in cannons:
            t.cancel()
        assert ok, "no progress under concurrent intake"
        # safety: per-node block sequences agree on the common prefix
        seqs = [[b.hash for b in blocks] for blocks in net.blocks.values() if blocks]
        for i in range(min(len(s) for s in seqs)):
            assert len({s[i] for s in seqs}) == 1, f"divergence at {i}"
        # no transmission committed twice within any node's chain
        for blocks in net.blocks.values():
            seen = set()
            for b in blocks:
                for t in b.transmissions:
                    tid = t.id
                    assert tid not in seen, "transmission committed twice"
                    seen.add(tid)
    finally:
        await net.stop()


@pytest.mark.asyncio
async def test_concurrent_propose_is_single_flight():
    """propose_batch under concurrent callers must produce at most ONE
    in-flight proposal per round (propose_lock; primary.rs:339-621)."""
    net = TestNetwork(1)
    node = next(iter(net.nodes.values()))
    p = node.primary
    for i in range(10):
        await p.process_unconfirmed_solution(_sol(i, net))
    results = await asyncio.gather(*[p.propose_batch() for _ in range(8)])
    assert sum(1 for r in results if r) <= 1, "multiple proposals in one round"
    assert p.proposed_batch is not None
    # all drained transmissions live in exactly one place (the proposal)
    assert len(p.proposed_batch.transmissions) == 10
    assert all(len(w.ready) == 0 for w in p.workers)


@pytest.mark.asyncio
async def test_commit_reinsert_race():
    """A failed block advance reinserts transmissions; concurrent ingest
    of the same ids must not duplicate or drop them."""
    net = TestNetwork(1)
    node = next(iter(net.nodes.values()))
    p = node.primary
    sols = [_sol(100 + i, net) for i in range(8)]
    for s in sols:
        await p.process_unconfirmed_solution(s)
    drained = await p._drain_and_revalidate()
    assert len(drained) == 8

    async def reingest():
        for s in sols:
            try:
                await p.process_unconfirmed_solution(s)
            except Exception:
                pass

    async def reinsert():
        p.reinsert_transmissions(drained)

    await asyncio.gather(reingest(), reinsert())
    total = sum(len(w.ready) for w in p.workers)
    ids = [tid for w in p.workers for tid in w.ready]
    assert total == 8, f"lost or duplicated transmissions: {total}"
    assert len(set(ids)) == 8
    assert all(t.kind == TX_SOLUTION for t in ids)
