"""In-process BFT e2e: state coherence, quorum behavior (SURVEY.md §4 items
4/6 — narwhal_e2e.rs / bft_e2e.rs equivalents over the mock transport)."""

import asyncio

import pytest

from tests.common_bft import TestNetwork


async def _run_until(cond, timeout=75.0, interval=0.2):
    loop = asyncio.get_event_loop()
    deadline = loop.time() + timeout
    while loop.time() < deadline:
        if cond():
            return True
        await asyncio.sleep(interval)
    return False


@pytest.mark.asyncio
async def test_commits_blocks_with_quorum():
    net = TestNetwork(4)
    net.connect_all()
    await net.start()
    try:
        await net.fire_transmissions(6)
        ok = await _run_until(lambda: net.max_committed_height() >= 2)
        assert ok, "network failed to commit 2 blocks"
        # state coherence: all nodes commit the same block sequence prefix
        seqs = [
            [b.hash for b in blocks] for blocks in net.blocks.values() if blocks
        ]
        min_len = min(len(s) for s in seqs)
        assert min_len >= 1
        for i in range(min_len):
            assert len({s[i] for s in seqs}) == 1, f"divergent block at index {i}"
        # committed blocks carry round/subdag info
        any_blocks = next(iter(net.blocks.values()))
        assert any_blocks[0].subdag is not None
        assert any_blocks[0].round % 2 == 0
    finally:
        await net.stop()


@pytest.mark.asyncio
async def test_quorum_threshold_not_reached():
    """With 2 of 4 nodes dropped, no progress is possible (quorum break)."""
    net = TestNetwork(4)
    net.connect_all()
    addrs = list(net.nodes)
    net.drop_node(addrs[2])
    net.drop_node(addrs[3])
    await net.start()
    try:
        await net.fire_transmissions(4)
        made_progress = await _run_until(lambda: net.max_committed_height() >= 1, timeout=8.0)
        assert not made_progress, "committed blocks without quorum"
    finally:
        await net.stop()


@pytest.mark.asyncio
async def test_transient_quorum_break_recovers():
    """Drop one node (3/4 still live -> quorum holds), then restore."""
    net = TestNetwork(4)
    net.connect_all()
    addrs = list(net.nodes)
    await net.start()
    try:
        await net.fire_transmissions(4)
        assert await _run_until(lambda: net.max_committed_height() >= 1)
        net.drop_node(addrs[0])
        await net.fire_transmissions(4)
        h = net.max_committed_height()
        assert await _run_until(lambda: net.max_committed_height() >= h + 1, timeout=30.0), \
            "3/4 network stalled"
        net.restore_node(addrs[0])
    finally:
        await net.stop()


@pytest.mark.asyncio
async def test_leader_election_consistency():
    net = TestNetwork(4)
    committee = net.committee
    for r in range(2, 20, 2):
        leaders = {committee.get_leader(r) for _ in range(3)}
        assert len(leaders) == 1
        assert leaders.pop() in committee.addresses
