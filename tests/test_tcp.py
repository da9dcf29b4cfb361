"""TCP stack unit tests (node/tcp/src/tcp.rs:513-719 test coverage model):
connect/disconnect semantics, self-connect and duplicate refusal,
connection limits, handshake failure/timeout handling, stats."""

import asyncio

import pytest

from snarkos_tpu.node import codec
from snarkos_tpu.node.tcp import Tcp, TcpConfig


async def _listener(tcp: Tcp):
    return await tcp.enable_listener()


@pytest.mark.asyncio
async def test_connect_disconnect_roundtrip():
    a, b = Tcp(name="a"), Tcp(name="b")
    addr_b = await _listener(b)
    await a.connect(addr_b)
    assert a.num_connected == 1
    # responder side registers too (no handshake -> immediate)
    await asyncio.sleep(0.1)
    assert b.num_connected == 1
    await a.disconnect(addr_b)
    assert a.num_connected == 0
    await a.shut_down()
    await b.shut_down()


@pytest.mark.asyncio
async def test_self_connect_refused():
    a = Tcp(name="a")
    addr = await _listener(a)
    with pytest.raises(ConnectionError, match="self"):
        await a.connect(addr)
    await a.shut_down()


@pytest.mark.asyncio
async def test_duplicate_connect_refused():
    a, b = Tcp(name="a"), Tcp(name="b")
    addr_b = await _listener(b)
    await a.connect(addr_b)
    with pytest.raises(ConnectionError, match="already connected"):
        await a.connect(addr_b)
    await a.shut_down()
    await b.shut_down()


@pytest.mark.asyncio
async def test_max_connections_enforced():
    server = Tcp(TcpConfig(max_connections=2), name="server")
    await _listener(server)
    clients = [Tcp(name=f"c{i}") for i in range(3)]
    listeners = [await _listener(c) for c in clients]
    for c in clients:
        await c.connect(server.listening_addr)
    await asyncio.sleep(0.2)
    # server accepted at most 2
    assert server.num_connected <= 2
    for c in clients:
        await c.shut_down()
    await server.shut_down()
    del listeners


@pytest.mark.asyncio
async def test_handshake_failure_rejects_connection():
    async def failing_handshake(conn):
        raise ConnectionError("nope")

    server = Tcp(name="server")
    server.handshake = failing_handshake
    await _listener(server)
    client = Tcp(name="client")
    client.handshake = failing_handshake
    with pytest.raises(Exception):
        await client.connect(server.listening_addr)
    assert client.num_connected == 0
    await asyncio.sleep(0.1)
    assert server.num_connected == 0
    await client.shut_down()
    await server.shut_down()


@pytest.mark.asyncio
async def test_handshake_timeout_enforced():
    async def stalling_handshake(conn):
        await asyncio.sleep(30)

    server = Tcp(name="server")
    await _listener(server)
    client = Tcp(TcpConfig(handshake_timeout_s=0.3), name="client")
    client.handshake = stalling_handshake
    with pytest.raises(asyncio.TimeoutError):
        await client.connect(server.listening_addr)
    assert client.num_connected == 0
    await client.shut_down()
    await server.shut_down()


@pytest.mark.asyncio
async def test_unicast_broadcast_and_stats():
    received = []

    async def on_msg(addr, payload):
        received.append((addr, payload))

    server = Tcp(name="server")
    server.process_message = on_msg
    await _listener(server)
    c1, c2 = Tcp(name="c1"), Tcp(name="c2")
    await c1.connect(server.listening_addr)
    await c2.connect(server.listening_addr)
    assert c1.unicast(server.listening_addr, b"hello")
    c2.broadcast(b"world")
    await asyncio.sleep(0.3)
    payloads = sorted(p for _, p in received)
    assert payloads == [b"hello", b"world"]
    st = c1.stats[server.listening_addr]
    assert st.sent_msgs == 1 and st.sent_bytes == len(b"hello") + 4
    await c1.shut_down()
    await c2.shut_down()
    await server.shut_down()


@pytest.mark.asyncio
async def test_oversize_frame_disconnects():
    server = Tcp(TcpConfig(max_frame_size=64), name="server")
    await _listener(server)
    client = Tcp(name="client")
    await client.connect(server.listening_addr)
    await asyncio.sleep(0.1)
    client.unicast(server.listening_addr, b"x" * 128)  # over server's cap
    await asyncio.sleep(0.3)
    assert server.num_connected == 0  # reader dropped the peer
    await client.shut_down()
    await server.shut_down()


@pytest.mark.asyncio
async def test_peer_disconnect_cleans_up():
    events = []

    async def on_disc(addr):
        events.append(addr)

    server = Tcp(name="server")
    server.on_disconnect = on_disc
    await _listener(server)
    client = Tcp(name="client")
    await client.connect(server.listening_addr)
    await asyncio.sleep(0.1)
    assert server.num_connected == 1
    await client.shut_down()
    await asyncio.sleep(0.3)
    assert server.num_connected == 0
    assert len(events) == 1


@pytest.mark.asyncio
async def test_frame_codec_roundtrip_and_limits():
    reader = asyncio.StreamReader()
    reader.feed_data((3).to_bytes(4, "little") + b"abc")
    assert await codec.read_frame(reader, 64) == b"abc"
    reader.feed_data((1 << 29).to_bytes(4, "little"))
    with pytest.raises(codec.FrameError):
        await codec.read_frame(reader, codec.MAX_FRAME_ROUTER // 4)
