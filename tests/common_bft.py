"""Single-process N-validator test network with an in-process transport
(the reference's TestNetwork pattern, node/bft/tests/common/primary.rs:59-250,
with the Transport seam mocked as direct async dispatch)."""

from __future__ import annotations

import asyncio

from snarkos_tpu.crypto.ref import edwards
from snarkos_tpu.node import events as ev
from snarkos_tpu.node.consensus import Consensus
from snarkos_tpu.node.ledger import MockLedgerService
from snarkos_tpu.node.types import Committee, point_to_address


class MockTransport:
    """Routes events directly between in-process consensus instances."""

    def __init__(self, network: "TestNetwork", my_address: str):
        self.network = network
        self.address = my_address
        self.connected: set[str] = set()

    def send(self, peer, event) -> bool:
        # peer may be a validator address (str); in mock mode addr==address
        target = peer if isinstance(peer, str) else peer[0]
        if target not in self.network.nodes:
            return False
        self.network.deliver(self.address, target, event)
        return True

    def broadcast(self, event) -> int:
        n = 0
        for addr in self.connected:
            if self.send(addr, event):
                n += 1
        return n


class TestNetwork:
    """N complete Consensus instances wired over MockTransports."""

    def __init__(self, num_nodes: int, translucent: bool = True):
        self.accounts = [edwards.Account.new(seed=bytes([i + 1]) * 32) for i in range(num_nodes)]
        members = {point_to_address(a.pk): 100 for a in self.accounts}
        self.committee = Committee.new(1, members)
        self.nodes: dict[str, Consensus] = {}
        self.transports: dict[str, MockTransport] = {}
        self.blocks: dict[str, list] = {}
        self.dropped: set[str] = set()
        for acct in self.accounts:
            addr = point_to_address(acct.pk)
            ledger = MockLedgerService(self.committee)
            transport = MockTransport(self, addr)
            node = Consensus(_AccountView(acct), ledger, transport)
            self.nodes[addr] = node
            self.transports[addr] = transport
            self.blocks[addr] = []
            node.on_block = self._make_block_hook(addr)

    def _make_block_hook(self, addr):
        async def hook(block):
            self.blocks[addr].append(block)

        return hook

    def connect_all(self):
        for addr, transport in self.transports.items():
            transport.connected = {a for a in self.nodes if a != addr}

    def deliver(self, sender: str, target: str, event):
        if target in self.dropped or sender in self.dropped:
            return
        node = self.nodes[target]
        sender_addr = (sender,)  # socket-addr stand-in: 1-tuple of address

        async def handle():
            try:
                if isinstance(event, ev.BatchPropose):
                    await node.primary.process_batch_propose(sender, event)
                elif isinstance(event, ev.BatchSignature):
                    await node.primary.process_batch_signature(sender, event, sender)
                elif isinstance(event, ev.BatchCertified):
                    await node.primary.process_batch_certified(sender, event)
                elif isinstance(event, ev.CertificateRequest):
                    node.primary.serve_certificate_request(sender, event)
                elif isinstance(event, ev.CertificateResponse):
                    await node.primary.process_certificate_response(sender, event)
                elif isinstance(event, ev.TransmissionRequest):
                    node.primary.worker.serve_transmission_request(sender, event)
                elif isinstance(event, ev.TransmissionResponse):
                    node.primary.worker.process_transmission_response(event)
                elif isinstance(event, ev.WorkerPing):
                    node.primary.worker.process_worker_ping(sender, event)
            except Exception as exc:
                import logging
                logging.getLogger("testnet").debug(
                    "%s handling %s from %s failed: %s",
                    target[:12], type(event).__name__, sender[:12], exc)

        asyncio.get_event_loop().create_task(handle())

    async def start(self):
        for node in self.nodes.values():
            await node.run()

    async def stop(self):
        for node in self.nodes.values():
            await node.shut_down()

    def drop_node(self, addr: str):
        self.dropped.add(addr)

    def restore_node(self, addr: str):
        self.dropped.discard(addr)

    async def fire_transmissions(self, count: int = 8):
        """Cannon dummy (mock-checked) solutions into every node's worker."""
        from snarkos_tpu.node.types import Solution, Transmission

        for i in range(count):
            sol = Solution(
                epoch_hash=b"\x01" * 32,
                address=next(iter(self.nodes)),
                nonce=i,
                commitment=bytes(97),
                eval_y=i,
                witness=bytes(97),
            )
            for node in self.nodes.values():
                try:
                    await node.primary.process_unconfirmed_solution(sol)
                except Exception:
                    pass

    def max_committed_height(self) -> int:
        return max((len(b) for b in self.blocks.values()), default=0)


class _AccountView:
    """Adapter exposing .address/.sk/.pk for signing APIs."""

    def __init__(self, acct):
        self.sk = acct.sk
        self.pk = acct.pk
        self.address = point_to_address(acct.pk)
