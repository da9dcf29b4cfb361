"""Cross-role e2e over the public router plane: a Client syncs blocks from
a Validator via BlockLocators/BlockRequest gossip (SURVEY.md §3.5)."""

import asyncio

import pytest

from snarkos_tpu.node import messages as msg
from snarkos_tpu.node.cli import dev_account, dev_committee
from snarkos_tpu.node.roles import Client, Validator
from snarkos_tpu.node.types import Block, point_to_address


class _AV:
    def __init__(self, acct):
        self.sk, self.pk = acct.sk, acct.pk
        self.address = point_to_address(acct.pk)


async def _wait_for(cond, timeout=60.0):
    loop = asyncio.get_event_loop()
    deadline = loop.time() + timeout
    while loop.time() < deadline:
        if cond():
            return True
        await asyncio.sleep(0.25)
    return False


def _grow_chain(ledger, n):
    for i in range(n):
        prev = ledger.latest_block
        ledger.advance_to_next_block(Block(
            height=prev.height + 1, previous_hash=prev.hash,
            timestamp=prev.timestamp + 1, round=2 * (i + 1),
            epoch_hash=ledger._next_epoch_hash(prev.height + 1),
            proof_target=prev.proof_target, subdag=None, transmissions=()))


@pytest.mark.asyncio
async def test_client_syncs_from_validator():
    committee = dev_committee(1)
    validator = Validator(_AV(dev_account(0)), committee, node_port=0,
                          bft_port=0, rest_port=None, translucent=True)
    _grow_chain(validator.ledger, 12)
    await validator.start()
    client = Client(_AV(dev_account(5)), committee, node_port=0, rest_port=None)
    # translucent-style client: skip proof verification during sync
    client.ledger_service.check_next_block = lambda b: None
    await client.start()
    try:
        ok = await client.router.connect(validator.router.local_addr)
        assert ok, "router handshake failed"
        # exchange pings so locators propagate (the heartbeat interval is
        # long; send one directly)
        ping = msg.Ping(msg.VERSION, msg.NodeType.CLIENT,
                        client.ledger.latest_block_locators())
        client.router.send(validator.router.local_addr, ping)
        synced = await _wait_for(lambda: client.ledger.latest_height >= 12)
        assert synced, f"client stuck at height {client.ledger.latest_height}"
        assert client.ledger.get_hash(12) == validator.ledger.get_hash(12)
    finally:
        await client.shut_down()
        await validator.shut_down()


@pytest.mark.asyncio
async def test_router_handshake_rejects_wrong_genesis():
    from snarkos_tpu.node.router import Router

    committee = dev_committee(1)
    validator = Validator(_AV(dev_account(0)), committee, node_port=0,
                          bft_port=0, rest_port=None, translucent=True)
    await validator.start()
    try:
        rogue = Router(_AV(dev_account(9)), msg.NodeType.CLIENT, b"\xAB" * 32)
        await rogue.run()
        ok = await rogue.connect(validator.router.local_addr)
        await asyncio.sleep(0.5)
        assert not rogue.peers, "rogue connected despite genesis mismatch"
        await rogue.shut_down()
    finally:
        await validator.shut_down()


@pytest.mark.asyncio
async def test_client_gossip_verify_off_event_loop():
    """Regression (round-3 verdict weak #6): the Client must run
    check_{solution,transaction}_basic in an executor (reference uses
    spawn_blocking, ledger.rs:312,341) — a slow verify must not freeze the
    event loop that decodes frames for every peer."""
    import random
    import time as _time

    from snarkos_tpu.node import types

    committee = dev_committee(1)
    client = Client(_AV(dev_account(6)), committee, node_port=0, rest_port=None)
    client.ledger_service.check_solution_basic = lambda sol: _time.sleep(0.8)
    client.router.propagate = lambda m, exclude=None: None

    rng = random.Random(99)
    sol = types.Solution(
        epoch_hash=bytes(32), address="aleo1" + "00" * 32, nonce=7,
        commitment=bytes(97), eval_y=rng.getrandbits(250), witness=bytes(97),
    )
    m = msg.UnconfirmedSolution(sol.id, sol.to_bytes())

    task = asyncio.ensure_future(
        client._on_unconfirmed_solution(("127.0.0.1", 1), None, m))
    loop = asyncio.get_event_loop()
    t0 = loop.time()
    ticks = 0
    while not task.done() and loop.time() - t0 < 5.0:
        await asyncio.sleep(0.02)
        ticks += 1
    assert task.done(), "verification never completed"
    assert loop.time() - t0 >= 0.7, "slow verify did not actually run"
    # If the verify blocked the loop, this coroutine would get ~1 tick; the
    # executor path lets the loop spin throughout the 0.8 s verify.
    assert ticks >= 15, f"event loop starved: only {ticks} ticks during verify"
