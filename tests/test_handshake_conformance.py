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
