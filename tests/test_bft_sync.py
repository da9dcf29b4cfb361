"""BFT-side sync: deep-behind (no-BFT fast path) vs near-tip
(subdag-availability-validated) block syncing
(node/bft/src/sync/mod.rs:299-513 semantics)."""

import asyncio

import pytest

from snarkos_tpu.node.bft.storage import MAX_GC_ROUNDS
from snarkos_tpu.node.consensus import Consensus
from snarkos_tpu.node.ledger import MockLedgerService

from tests.common_bft import TestNetwork, _AccountView


async def _run_until(cond, timeout=75.0, interval=0.2):
    loop = asyncio.get_event_loop()
    deadline = loop.time() + timeout
    while loop.time() < deadline:
        if cond():
            return True
        await asyncio.sleep(interval)
    return False


class _NullTransport:
    def send(self, peer, event):
        return False

    def broadcast(self, event):
        return 0


@pytest.mark.asyncio
async def test_near_tip_sync_waits_for_availability():
    """A synced block advances the ledger only after its leader certificate
    reaches the availability threshold among next-round certificates —
    which arrive with the NEXT block's subdag (sync/mod.rs:424-452)."""
    net = TestNetwork(4)
    net.connect_all()
    await net.start()
    try:
        await net.fire_transmissions(6)
        ok = await _run_until(lambda: net.max_committed_height() >= 3)
        assert ok, "source network failed to commit 3 blocks"
    finally:
        await net.stop()
    blocks = max(net.blocks.values(), key=len)[:3]
    assert all(b.subdag is not None for b in blocks)

    lagging = Consensus(_AccountView(net.accounts[0]),
                        MockLedgerService(net.committee), _NullTransport())
    base = lagging.ledger.latest_height()

    # feed block 1 alone: its leader has no next-round certs yet -> buffered
    lagging.sync_storage_with_block(blocks[0])
    assert lagging.ledger.latest_height() == base, \
        "block advanced without availability evidence"
    assert blocks[0].height in lagging.latest_block_responses

    # feed block 2: its subdag carries the certificates that certify
    # block 1's leader -> block 1 (at least) advances
    lagging.sync_storage_with_block(blocks[1])
    assert lagging.ledger.latest_height() >= blocks[0].height

    lagging.sync_storage_with_block(blocks[2])
    assert lagging.ledger.latest_height() >= blocks[1].height


@pytest.mark.asyncio
async def test_deep_behind_gate_and_fast_path():
    """is_deep_behind splits on tip - MAX_GC_ROUNDS/2; the fast path
    advances the ledger without any subdag validation."""
    net = TestNetwork(4)
    net.connect_all()
    await net.start()
    try:
        await net.fire_transmissions(4)
        ok = await _run_until(lambda: net.max_committed_height() >= 2)
        assert ok
    finally:
        await net.stop()
    blocks = max(net.blocks.values(), key=len)[:2]

    lagging = Consensus(_AccountView(net.accounts[0]),
                        MockLedgerService(net.committee), _NullTransport())
    # gate arithmetic
    assert lagging.is_deep_behind(MAX_GC_ROUNDS)  # tip 50, we are at 0
    assert not lagging.is_deep_behind(MAX_GC_ROUNDS // 2)
    # fast path: advances immediately, no buffering
    lagging.sync_ledger_with_block_without_bft(blocks[0])
    assert lagging.ledger.latest_height() == blocks[0].height
    assert not lagging.latest_block_responses
    assert lagging.storage.current_round() == blocks[0].round + 1
