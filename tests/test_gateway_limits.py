"""Gateway rate limiting (gateway.rs:208-236,544-548): spamming peers are
disconnected; normal traffic volumes are not."""

import asyncio

import pytest

from snarkos_tpu.node import events as ev
from snarkos_tpu.node.cli import dev_account, dev_committee
from snarkos_tpu.node.gateway import CACHE_EVENTS_PER_PEER, Gateway
from snarkos_tpu.node.ledger import MockLedgerService
from snarkos_tpu.node.types import point_to_address


class _AV:
    def __init__(self, acct):
        self.sk, self.pk = acct.sk, acct.pk
        self.address = point_to_address(acct.pk)


async def _pair():
    committee = dev_committee(2)
    gws = []
    for i in range(2):
        g = Gateway(_AV(dev_account(i)), MockLedgerService(committee))
        await g.run()
        gws.append(g)
    await gws[0].connect_to(gws[1].local_addr)
    for _ in range(40):
        if gws[0].connected_validators and gws[1].connected_validators:
            break
        await asyncio.sleep(0.05)
    return gws


@pytest.mark.asyncio
async def test_event_flood_disconnects():
    g0, g1 = await _pair()
    try:
        assert len(g1.connected_validators) == 1
        for _ in range(CACHE_EVENTS_PER_PEER + 50):
            g0.broadcast(ev.ValidatorsRequest())
        deadline = asyncio.get_event_loop().time() + 10
        while asyncio.get_event_loop().time() < deadline:
            if len(g1.connected_validators) == 0:
                break
            await asyncio.sleep(0.1)
        assert len(g1.connected_validators) == 0, "flooder was not disconnected"
    finally:
        await g0.shut_down()
        await g1.shut_down()


@pytest.mark.asyncio
async def test_normal_traffic_not_limited():
    g0, g1 = await _pair()
    try:
        for _ in range(20):
            g0.broadcast(ev.ValidatorsRequest())
            await asyncio.sleep(0.01)
        await asyncio.sleep(0.5)
        assert len(g1.connected_validators) == 1
    finally:
        await g0.shut_down()
        await g1.shut_down()
