"""Protocol-conformance probes with a raw-codec TestPeer (SURVEY.md §4
item 5): handshake order, malformed frames, version gates, disconnect
behavior — against real Router/Gateway listeners."""

import asyncio

import pytest

from snarkos_tpu.crypto.ref import edwards
from snarkos_tpu.node import codec, events as ev, messages as msg
from snarkos_tpu.node.cli import dev_account, dev_committee
from snarkos_tpu.node.ledger import MockLedgerService
from snarkos_tpu.node.router import Router
from snarkos_tpu.node.types import point_to_address


class _AV:
    def __init__(self, acct):
        self.sk, self.pk = acct.sk, acct.pk
        self.address = point_to_address(acct.pk)


GENESIS = b"\x11" * 32


async def _router():
    r = Router(_AV(dev_account(0)), msg.NodeType.VALIDATOR, GENESIS)
    await r.run()
    return r


@pytest.mark.asyncio
async def test_responder_handshake_happy_path():
    """A raw TestPeer can complete the router handshake byte-for-byte."""
    router = await _router()
    try:
        peer_acct = _AV(dev_account(1))
        reader, writer = await asyncio.open_connection(*router.local_addr)
        my_nonce = 42
        req = msg.ChallengeRequest(msg.VERSION, 1234, msg.NodeType.CLIENT,
                                   peer_acct.address, my_nonce)
        codec.write_frame(writer, msg.serialize(req), codec.MAX_FRAME_HANDSHAKE)
        await writer.drain()
        peer_req = msg.deserialize(await codec.read_frame(reader, codec.MAX_FRAME_HANDSHAKE))
        assert isinstance(peer_req, msg.ChallengeRequest)
        sig = edwards.sign_bytes(peer_acct.sk, peer_acct.pk,
                                 peer_req.nonce.to_bytes(8, "little") + my_nonce.to_bytes(8, "little"))
        resp = msg.ChallengeResponse(GENESIS, b"\x00" * 32, sig, my_nonce)
        codec.write_frame(writer, msg.serialize(resp), codec.MAX_FRAME_HANDSHAKE)
        await writer.drain()
        peer_resp = msg.deserialize(await codec.read_frame(reader, codec.MAX_FRAME_HANDSHAKE))
        assert isinstance(peer_resp, msg.ChallengeResponse)
        await asyncio.sleep(0.3)
        assert router.number_of_connected_peers() == 1
        writer.close()
    finally:
        await router.shut_down()


@pytest.mark.asyncio
async def test_wrong_first_message_rejected():
    """Sending Ping before the challenge handshake must not connect."""
    router = await _router()
    try:
        reader, writer = await asyncio.open_connection(*router.local_addr)
        codec.write_frame(writer, msg.serialize(msg.Ping(msg.VERSION, 0, None)),
                          codec.MAX_FRAME_HANDSHAKE)
        await writer.drain()
        await asyncio.sleep(0.5)
        assert router.number_of_connected_peers() == 0
        writer.close()
    finally:
        await router.shut_down()


@pytest.mark.asyncio
async def test_outdated_version_rejected():
    router = await _router()
    try:
        peer_acct = _AV(dev_account(1))
        reader, writer = await asyncio.open_connection(*router.local_addr)
        req = msg.ChallengeRequest(0, 1234, msg.NodeType.CLIENT, peer_acct.address, 1)
        codec.write_frame(writer, msg.serialize(req), codec.MAX_FRAME_HANDSHAKE)
        await writer.drain()
        await asyncio.sleep(0.5)
        assert router.number_of_connected_peers() == 0
        writer.close()
    finally:
        await router.shut_down()


@pytest.mark.asyncio
async def test_garbage_frame_rejected():
    router = await _router()
    try:
        reader, writer = await asyncio.open_connection(*router.local_addr)
        writer.write(b"\xff\xff\xff\x7f")  # insane length prefix
        await writer.drain()
        await asyncio.sleep(0.5)
        assert router.number_of_connected_peers() == 0
        writer.close()
    finally:
        await router.shut_down()


@pytest.mark.asyncio
async def test_oversized_handshake_frame_rejected():
    router = await _router()
    try:
        reader, writer = await asyncio.open_connection(*router.local_addr)
        # 2 MiB frame during handshake (cap is 1 MiB)
        writer.write((2 * 1024 * 1024).to_bytes(4, "little") + b"\x00" * 1024)
        await writer.drain()
        await asyncio.sleep(0.5)
        assert router.number_of_connected_peers() == 0
        writer.close()
    finally:
        await router.shut_down()


async def _router_role(node_type, index=0):
    r = Router(_AV(dev_account(index)), node_type, GENESIS)
    await r.run()
    return r


async def _peer_complete_handshake(addr, peer_acct, peer_type,
                                   genesis=GENESIS, sign_with=None,
                                   listener_port=1234):
    """Raw TestPeer initiator: runs the full challenge/response exchange."""
    reader, writer = await asyncio.open_connection(*addr)
    my_nonce = 77
    req = msg.ChallengeRequest(msg.VERSION, listener_port, peer_type,
                               peer_acct.address, my_nonce)
    codec.write_frame(writer, msg.serialize(req), codec.MAX_FRAME_HANDSHAKE)
    await writer.drain()
    peer_req = msg.deserialize(await codec.read_frame(reader, codec.MAX_FRAME_HANDSHAKE))
    signer = sign_with or peer_acct
    sig = edwards.sign_bytes(signer.sk, signer.pk,
                             peer_req.nonce.to_bytes(8, "little")
                             + my_nonce.to_bytes(8, "little"))
    resp = msg.ChallengeResponse(genesis, b"\x00" * 32, sig, my_nonce)
    codec.write_frame(writer, msg.serialize(resp), codec.MAX_FRAME_HANDSHAKE)
    await writer.drain()
    return reader, writer


ROLES = [msg.NodeType.CLIENT, msg.NodeType.PROVER, msg.NodeType.VALIDATOR]


@pytest.mark.asyncio
@pytest.mark.parametrize("node_type", ROLES, ids=["client", "prover", "validator"])
@pytest.mark.parametrize("peer_type", ROLES, ids=["p-client", "p-prover", "p-validator"])
async def test_responder_matrix(node_type, peer_type):
    """Reference handshake.rs:95-283 responder grid: every node role must
    complete the handshake with every peer role (TestPeer as initiator)."""
    router = await _router_role(node_type)
    try:
        reader, writer = await _peer_complete_handshake(
            router.local_addr, _AV(dev_account(1)), peer_type)
        resp = msg.deserialize(await codec.read_frame(reader, codec.MAX_FRAME_HANDSHAKE))
        assert isinstance(resp, msg.ChallengeResponse)
        await asyncio.sleep(0.3)
        assert router.number_of_connected_peers() == 1
        peer = next(iter(router.peers.values()))
        assert peer.node_type == peer_type
        writer.close()
    finally:
        await router.shut_down()


@pytest.mark.asyncio
@pytest.mark.parametrize("node_type", ROLES, ids=["client", "prover", "validator"])
@pytest.mark.parametrize("variant", ["good", "bad_sig", "wrong_genesis"])
async def test_initiator_matrix(node_type, variant):
    """Initiator grid: the node dials a raw TestPeer listener; a correct
    responder connects, a forged signature or wrong genesis must not."""
    router = await _router_role(node_type)
    peer_acct = _AV(dev_account(1))
    wrong_acct = _AV(dev_account(2))
    done = asyncio.Event()

    async def peer_server(reader, writer):
        try:
            peer_req = msg.deserialize(
                await codec.read_frame(reader, codec.MAX_FRAME_HANDSHAKE))
            my_nonce = 99
            my_req = msg.ChallengeRequest(msg.VERSION, 4242, msg.NodeType.CLIENT,
                                          peer_acct.address, my_nonce)
            codec.write_frame(writer, msg.serialize(my_req), codec.MAX_FRAME_HANDSHAKE)
            peer_resp = msg.deserialize(
                await codec.read_frame(reader, codec.MAX_FRAME_HANDSHAKE))
            assert isinstance(peer_resp, msg.ChallengeResponse)
            signer = wrong_acct if variant == "bad_sig" else peer_acct
            genesis = b"\x99" * 32 if variant == "wrong_genesis" else GENESIS
            sig = edwards.sign_bytes(signer.sk, signer.pk,
                                     peer_req.nonce.to_bytes(8, "little")
                                     + my_nonce.to_bytes(8, "little"))
            resp = msg.ChallengeResponse(genesis, b"\x00" * 32, sig, my_nonce)
            codec.write_frame(writer, msg.serialize(resp), codec.MAX_FRAME_HANDSHAKE)
            await writer.drain()
        except Exception:
            pass
        finally:
            done.set()

    server = await asyncio.start_server(peer_server, "127.0.0.1", 0)
    addr = server.sockets[0].getsockname()[:2]
    try:
        ok = await router.connect(addr)
        await asyncio.wait_for(done.wait(), 5)
        await asyncio.sleep(0.2)
        if variant == "good":
            assert ok and router.number_of_connected_peers() == 1
        else:
            assert not ok and router.number_of_connected_peers() == 0
    finally:
        server.close()
        await router.shut_down()


@pytest.mark.asyncio
async def test_bad_signature_rejected_responder_side():
    """TestPeer initiator signing with the WRONG key must be refused."""
    router = await _router()
    try:
        reader, writer = await _peer_complete_handshake(
            router.local_addr, _AV(dev_account(1)), msg.NodeType.CLIENT,
            sign_with=_AV(dev_account(2)))
        await asyncio.sleep(0.5)
        assert router.number_of_connected_peers() == 0
        writer.close()
    finally:
        await router.shut_down()


@pytest.mark.asyncio
async def test_wrong_genesis_rejected_responder_side():
    router = await _router()
    try:
        reader, writer = await _peer_complete_handshake(
            router.local_addr, _AV(dev_account(1)), msg.NodeType.CLIENT,
            genesis=b"\x55" * 32)
        await asyncio.sleep(0.5)
        assert router.number_of_connected_peers() == 0
        writer.close()
    finally:
        await router.shut_down()


@pytest.mark.asyncio
async def test_simultaneous_connect():
    """Both routers dial each other at once (handshake.rs simultaneous
    connection case): no deadlock, both end up connected."""
    r1 = await _router_role(msg.NodeType.VALIDATOR, 0)
    r2 = await _router_role(msg.NodeType.CLIENT, 1)
    try:
        await asyncio.gather(
            r1.connect(r2.local_addr), r2.connect(r1.local_addr),
            return_exceptions=True,
        )
        await asyncio.sleep(0.3)
        assert r1.number_of_connected_peers() >= 1
        assert r2.number_of_connected_peers() >= 1
    finally:
        await r1.shut_down()
        await r2.shut_down()


@pytest.mark.asyncio
async def test_duplicate_connect_refused():
    """A second dial to an already-connected listener must be refused
    without disturbing the live connection (tcp.rs:205-264)."""
    r1 = await _router_role(msg.NodeType.VALIDATOR, 0)
    r2 = await _router_role(msg.NodeType.CLIENT, 1)
    try:
        assert await r1.connect(r2.local_addr)
        await asyncio.sleep(0.2)
        before = r1.number_of_connected_peers()
        ok = await r1.connect(r2.local_addr)
        assert not ok
        assert r1.number_of_connected_peers() == before
    finally:
        await r1.shut_down()
        await r2.shut_down()


@pytest.mark.asyncio
async def test_malformed_frame_post_handshake_disconnects():
    """A garbage length prefix AFTER a completed handshake is a fatal
    protocol error: the peer is dropped and its failure counter bumped."""
    router = await _router()
    try:
        reader, writer = await _peer_complete_handshake(
            router.local_addr, _AV(dev_account(1)), msg.NodeType.CLIENT)
        await codec.read_frame(reader, codec.MAX_FRAME_HANDSHAKE)
        await asyncio.sleep(0.3)
        assert router.number_of_connected_peers() == 1
        writer.write((0x7FFFFFFF).to_bytes(4, "little"))
        await writer.drain()
        await asyncio.sleep(0.5)
        assert router.number_of_connected_peers() == 0
        assert any(st.failures > 0 for st in router.tcp.stats.values())
        writer.close()
    finally:
        await router.shut_down()


@pytest.mark.asyncio
async def test_gateway_wrong_order_handshake():
    """Gateway: an event other than ChallengeRequest first -> no connection."""
    from snarkos_tpu.node.gateway import Gateway

    committee = dev_committee(2)
    gw = Gateway(_AV(dev_account(0)), MockLedgerService(committee))
    await gw.run()
    try:
        reader, writer = await asyncio.open_connection(*gw.local_addr)
        codec.write_frame(writer, ev.serialize(ev.ValidatorsRequest()),
                          codec.MAX_FRAME_HANDSHAKE)
        await writer.drain()
        await asyncio.sleep(0.5)
        assert len(gw.connected_validators) == 0
        writer.close()
    finally:
        await gw.shut_down()
