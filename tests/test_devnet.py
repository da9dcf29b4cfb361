"""Full-stack devnet e2e: 4 validators over real localhost TCP (gateway
plane with signed handshakes + wire codecs), translucent ledger checks.
The single-process equivalent of devnet.sh (SURVEY.md §4 item 8)."""

import asyncio

import pytest

from snarkos_tpu.node import messages as msg
from snarkos_tpu.node.cli import dev_account, dev_committee
from snarkos_tpu.node.ledger import MockLedgerService
from snarkos_tpu.node.roles import Validator
from snarkos_tpu.node.types import point_to_address


class _AV:
    def __init__(self, acct):
        self.sk, self.pk = acct.sk, acct.pk
        self.address = point_to_address(acct.pk)


async def _spawn_validators(n=4, base_gw=0):
    committee = dev_committee(n)
    nodes = []
    for i in range(n):
        v = Validator(
            _AV(dev_account(i)), committee,
            node_port=0, bft_port=0, rest_port=None, storage_path=None,
            translucent=True,
        )
        # mock ledger service checks for speed: replace verification-heavy
        # service with mock-committee semantics but keep the real chain
        await v.start()
        nodes.append(v)
    # wire gateways: everyone trusts everyone (the heartbeat keeps retrying,
    # healing dial failures under CI load), plus initial dials i -> 0..i-1
    for i, v in enumerate(nodes):
        v.gateway.trusted_validators = [
            nodes[j].gateway.local_addr for j in range(n) if j != i
        ]
    for i, v in enumerate(nodes):
        for j in range(i):
            await v.gateway.connect_to(nodes[j].gateway.local_addr)
    return nodes


async def _wait_for(cond, timeout=45.0):
    loop = asyncio.get_event_loop()
    deadline = loop.time() + timeout
    while loop.time() < deadline:
        if cond():
            return True
        await asyncio.sleep(0.25)
    return False


@pytest.mark.asyncio
async def test_tcp_devnet_commits_blocks():
    nodes = await _spawn_validators(4)
    try:
        connected = await _wait_for(
            lambda: all(len(v.gateway.connected_validators) == 3 for v in nodes),
            timeout=40.0,
        )
        assert connected, "gateways failed to form a full mesh"
        # inject mock-verified transmissions via each node's worker directly
        # (puzzle-valid solutions are exercised in test_puzzle)
        from snarkos_tpu.node.types import Solution

        from snarkos_tpu.node.ledger import create_transaction
        from snarkos_tpu.node.types import Transmission

        for i in range(4):
            sol = Solution(
                epoch_hash=nodes[0].ledger.latest_epoch_hash,
                address=nodes[0].account.address, nonce=i,
                commitment=bytes(97), eval_y=i, witness=bytes(97),
            )
            for v in nodes:
                v.consensus.primary.worker.ready[sol.id] = (
                    Transmission.from_solution(sol)
                )
        # one on-chain program execution riding consensus: committed blocks
        # must apply the credits.aleo transfer through the VM finalize path
        payer = nodes[0].account.address
        payee = "aleo1" + "c" * 64
        tx = create_transaction(
            f"execute credits.aleo/transfer_public {payee} 9u64".encode(),
            account=nodes[0].account)
        for v in nodes:
            v.consensus.primary.worker.ready[tx.id] = Transmission.from_transaction(tx)
        ok = await _wait_for(
            lambda: min(v.ledger.latest_height for v in nodes) >= 2, timeout=120.0
        )
        heights = [v.ledger.latest_height for v in nodes]
        assert ok, f"devnet failed to commit blocks: heights={heights}"
        # chain coherence across nodes
        h = min(heights)
        hashes = {v.ledger.get_hash(h) for v in nodes}
        assert len(hashes) == 1, "divergent chains"
        # the transfer committed on at least the nodes that included it;
        # any node at/above the committing height must agree on the mapping
        committed = await _wait_for(
            lambda: any(
                v.ledger.get_mapping_value("credits.aleo", "account", payee) == "9u64"
                for v in nodes
            ),
            timeout=60.0,
        )
        assert committed, "committed execute tx did not update mappings"
    finally:
        for v in nodes:
            await v.shut_down()


@pytest.mark.asyncio
async def test_gateway_rejects_unauthorized():
    """A non-committee account cannot complete the gateway handshake."""
    from snarkos_tpu.crypto.ref import edwards
    from snarkos_tpu.node.gateway import Gateway

    committee = dev_committee(2)
    v0 = Validator(_AV(dev_account(0)), committee, node_port=0, bft_port=0,
                   rest_port=None, translucent=True)
    await v0.start()
    try:
        outsider_acct = _AV(edwards.Account.new(seed=b"\x99" * 32))
        outsider = Gateway(outsider_acct, MockLedgerService(committee))
        await outsider.run()
        await outsider.connect_to(v0.gateway.local_addr)
        await asyncio.sleep(1.0)
        assert len(v0.gateway.connected_validators) == 0
        assert len(outsider.connected_validators) == 0
        await outsider.shut_down()
    finally:
        await v0.shut_down()
