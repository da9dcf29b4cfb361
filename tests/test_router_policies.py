"""Router policy behaviors (SURVEY.md §2.3): SYNC_LENIENCY gossip gating,
prover caps + peer churn in the heartbeat, and the worker's redundant-fetch
budget (pending.rs:35-47 equivalent, exercised via a mock transport)."""

import time

import pytest

from snarkos_tpu.node import events as ev, messages as msg
from snarkos_tpu.node.bft.primary import Worker
from snarkos_tpu.node.bft.storage import BFTMemoryService, NarwhalStorage
from snarkos_tpu.node.cli import dev_account, dev_committee
from snarkos_tpu.node.ledger import MockLedgerService
from snarkos_tpu.node.router import SYNC_LENIENCY, Peer, Router
from snarkos_tpu.node.types import TransmissionID, point_to_address


class _AV:
    def __init__(self, acct):
        self.sk, self.pk = acct.sk, acct.pk
        self.address = point_to_address(acct.pk)


def _router(**kw):
    return Router(_AV(dev_account(0)), msg.NodeType.CLIENT, b"\x00" * 32, **kw)


class _Locators:
    def __init__(self, height):
        self.latest_height = height

    def is_well_formed(self):
        return True

    def is_consistent_with(self, other):
        return True


def _peer_with_height(height, node_type=msg.NodeType.CLIENT):
    p = Peer(("127.0.0.1", 4130), node_type, msg.VERSION, "aleo1test")
    p.block_locators = _Locators(height)
    return p


def test_sync_leniency_gate():
    r = _router()
    r.latest_height_fn = lambda: 100
    # no peers -> synced
    assert r.is_within_sync_leniency()
    r.peers[("1.2.3.4", 1)] = _peer_with_height(100 + SYNC_LENIENCY)
    assert r.is_within_sync_leniency()
    r.peers[("1.2.3.5", 2)] = _peer_with_height(100 + SYNC_LENIENCY + 1)
    assert not r.is_within_sync_leniency()
    assert r.num_blocks_behind() == SYNC_LENIENCY + 1


@pytest.mark.asyncio
async def test_unconfirmed_gossip_dropped_while_syncing():
    r = _router()
    r.latest_height_fn = lambda: 0
    addr = ("1.2.3.4", 1)
    r.peers[addr] = _peer_with_height(1000)
    seen = []

    async def handler(a, p, mm):
        seen.append(mm)

    r.handlers[msg.UnconfirmedTransaction] = handler
    m = msg.UnconfirmedTransaction(TransmissionID(1, b"\x01" * 32), b"payload")
    await r._dispatch(addr, r.peers[addr], m)
    assert seen == []  # gated: 1000 blocks behind
    r.latest_height_fn = lambda: 1000
    await r._dispatch(addr, r.peers[addr], m)
    assert len(seen) == 1


@pytest.mark.asyncio
async def test_heartbeat_prover_cap():
    r = _router(max_peers=8)  # max_provers = 2
    for i in range(4):
        p = _peer_with_height(0, node_type=msg.NodeType.PROVER)
        p.first_seen = i  # oldest first
        r.peers[("10.0.0.%d" % i, 4130)] = p

    dropped = []

    async def fake_disconnect(addr):
        dropped.append(addr)
        r.peers.pop(addr, None)

    r.tcp.disconnect = fake_disconnect
    await r._heartbeat()
    assert len(dropped) == 2
    # the two oldest provers were evicted
    assert set(dropped) == {("10.0.0.0", 4130), ("10.0.0.1", 4130)}


@pytest.mark.asyncio
async def test_heartbeat_churns_oldest_at_max():
    r = _router(max_peers=3)
    for i in range(3):
        p = _peer_with_height(0)
        p.first_seen = 100 - i
        r.peers[("10.0.0.%d" % i, 4130)] = p
    r.candidate_peers.add(("10.9.9.9", 4130))

    dropped = []

    async def fake_disconnect(addr):
        dropped.append(addr)
        r.peers.pop(addr, None)

    r.tcp.disconnect = fake_disconnect
    await r._heartbeat()
    # exactly one (the longest-connected) peer rotated out
    assert dropped == [("10.0.0.2", 4130)]


# -- worker redundant fetch ---------------------------------------------------


class _MockTransport:
    def __init__(self):
        self.sent = []  # (peer, event)

    def send(self, peer, event):
        self.sent.append((peer, event))
        return True


def _worker(num_validators=10):
    committee = dev_committee(num_validators)
    ledger = MockLedgerService(committee)
    storage = NarwhalStorage(ledger, BFTMemoryService())
    transport = _MockTransport()
    return Worker(0, ledger, storage, transport), transport


def test_max_redundant_requests_cap():
    w, transport = _worker(num_validators=10)  # cap = 1 + 10//3 = 4
    assert w.max_redundant_requests() == 4
    tid = TransmissionID(0, b"\x07" * 32)
    # six distinct peers advertise the same missing transmission
    for i in range(6):
        w.process_worker_ping(("10.0.0.%d" % i, 5000),
                              ev.WorkerPing((tid,)))
    reqs = [p for p, e in transport.sent if isinstance(e, ev.TransmissionRequest)]
    assert len(reqs) == 4  # capped at 1 + N/3
    assert len(set(reqs)) == 4  # all to distinct peers


def test_redundant_requests_reset_after_expiry():
    w, transport = _worker(num_validators=3)  # cap = 2
    tid = TransmissionID(0, b"\x08" * 32)
    for i in range(3):
        w.process_worker_ping(("10.0.0.%d" % i, 5000), ev.WorkerPing((tid,)))
    assert len(transport.sent) == 2
    # force expiry: a later ping may re-request
    w.pending_expiry[tid] = time.time() - 1
    w.process_worker_ping(("10.0.0.9", 5000), ev.WorkerPing((tid,)))
    assert len(transport.sent) == 3


def test_same_peer_not_asked_twice():
    w, transport = _worker(num_validators=10)
    tid = TransmissionID(0, b"\x09" * 32)
    for _ in range(5):
        w.process_worker_ping(("10.0.0.1", 5000), ev.WorkerPing((tid,)))
    assert len(transport.sent) == 1
