"""Primary/consensus hardening (VERDICT r1 item 6-7): propose-time
re-validation, epoch-rollover solution clearing, time-bucketed handshake
attempt counting, sha256d multi-worker partitioning, and the O(1) DAG
certificate-id index."""

import asyncio
import hashlib
import time

import pytest

from snarkos_tpu.node.bft import primary as primary_mod
from snarkos_tpu.node.bft.primary import Primary, assign_to_worker
from snarkos_tpu.node.types import Solution, Transmission, TransmissionID, TX_SOLUTION

from tests.common_bft import TestNetwork


def _sol(i: int, net: TestNetwork) -> Solution:
    return Solution(
        epoch_hash=b"\x01" * 32, address=next(iter(net.nodes)), nonce=i,
        commitment=bytes(97), eval_y=i, witness=bytes(97),
    )


# ------------------------------------------------------ worker partitioning
def test_assign_to_worker_matches_sha256d():
    """partition.rs:32-67: low 128 bits of sha256d(tid bytes) mod N."""
    for i in range(20):
        tid = TransmissionID(TX_SOLUTION, hashlib.sha256(bytes([i])).digest())
        h = hashlib.sha256(hashlib.sha256(tid.to_bytes()).digest()).digest()
        expect = int.from_bytes(h[:16], "little") % 4
        assert assign_to_worker(tid, 4) == expect
    # single worker short-circuits
    tid = TransmissionID(TX_SOLUTION, b"\x07" * 32)
    assert assign_to_worker(tid, 1) == 0


@pytest.mark.asyncio
async def test_multi_worker_partition_and_drain():
    """With 2 workers, transmissions partition deterministically by id and
    a proposal drains from BOTH workers."""
    net = TestNetwork(1)
    node = next(iter(net.nodes.values()))
    p2 = Primary(node.primary.account, node.primary.ledger,
                 node.primary.storage, node.primary.transport, num_workers=2)
    sols = [_sol(i, net) for i in range(24)]
    for s in sols:
        await p2.process_unconfirmed_solution(s)
    # every transmission sits in exactly the worker its id maps to
    for w in p2.workers:
        for tid in w.ready:
            assert assign_to_worker(tid, 2) == w.id
    counts = [len(w.ready) for w in p2.workers]
    assert sum(counts) == 24 and all(c > 0 for c in counts), counts
    # propose drains from both workers
    drained = await p2._drain_and_revalidate()
    assert len(drained) == 24
    assert all(len(w.ready) == 0 for w in p2.workers)


# ------------------------------------------------- propose-time revalidation
@pytest.mark.asyncio
async def test_propose_revalidates_drained_transmissions():
    """A transmission committed to the ledger after ingest must NOT be
    proposed (primary.rs:491-576)."""
    net = TestNetwork(1)
    node = next(iter(net.nodes.values()))
    p = node.primary
    good, stale = _sol(1, net), _sol(2, net)
    await p.process_unconfirmed_solution(good)
    await p.process_unconfirmed_solution(stale)
    assert len(p.worker.ready) == 2
    # the ledger commits `stale` out from under the mempool
    committed = {stale.id}
    p.ledger.contains_transmission = lambda tid: tid in committed
    drained = await p._drain_and_revalidate()
    assert good.id in drained and stale.id not in drained


@pytest.mark.asyncio
async def test_propose_revalidates_against_basic_checks():
    """A transmission that stops passing check_solution_basic (e.g. epoch
    moved on) is skipped at propose time."""
    net = TestNetwork(1)
    node = next(iter(net.nodes.values()))
    p = node.primary
    sol = _sol(3, net)
    await p.process_unconfirmed_solution(sol)

    def reject(s):
        raise ValueError("stale epoch")

    p.ledger.check_solution_basic = reject
    drained = await p._drain_and_revalidate()
    assert sol.id not in drained


# ------------------------------------------------------ epoch rollover clear
def test_clear_worker_solutions():
    net = TestNetwork(1)
    node = next(iter(net.nodes.values()))
    p = node.primary
    s = _sol(9, net)
    p.worker.ready[s.id] = Transmission.from_solution(s)
    from snarkos_tpu.node.types import TX_TRANSACTION

    fake_tx_tid = TransmissionID(TX_TRANSACTION, b"\x05" * 32)
    p.worker.ready[fake_tx_tid] = Transmission(TX_TRANSACTION, b"")
    p.clear_worker_solutions()
    assert s.id not in p.worker.ready
    assert fake_tx_tid in p.worker.ready  # transactions survive rollover


# ---------------------------------------------- handshake attempt bucketing
def test_handshake_attempts_are_time_bucketed():
    """handshake.rs:304-314: a peer reconnecting slowly over a node's
    lifetime must not accumulate attempts forever."""
    from snarkos_tpu.node import router as router_mod

    attempts = []
    now = time.time()
    # 10 reconnects spread over > RADIO_SILENCE each: window prune keeps 1
    for k in range(10):
        t = now - (10 - k) * (router_mod.RADIO_SILENCE_S + 1)
        attempts[:] = [x for x in attempts if t - x < router_mod.RADIO_SILENCE_S]
        attempts.append(t)
        assert len(attempts) <= router_mod.MAXIMUM_CONNECTION_FAILURES
    # but a burst within the window trips the limit
    burst = []
    for k in range(router_mod.MAXIMUM_CONNECTION_FAILURES + 1):
        t = now + k * 0.01
        burst[:] = [x for x in burst if t - x < router_mod.RADIO_SILENCE_S]
        burst.append(t)
    assert len(burst) > router_mod.MAXIMUM_CONNECTION_FAILURES


# --------------------------------------------------------- DAG id indexing
def test_dag_certificate_id_index():
    from snarkos_tpu.node.bft.dag import DAG

    net = TestNetwork(4)
    addrs = list(net.nodes)
    dag = DAG()
    from snarkos_tpu.node.types import BatchHeader

    certs = []
    for i, addr in enumerate(addrs):
        acct = net.accounts[i]
        from tests.common_bft import _AccountView

        header = BatchHeader.sign_new(_AccountView(acct), 2, 1000 + i,
                                      net.committee.id, [], ())
        from snarkos_tpu.node.types import BatchCertificate

        cert = BatchCertificate(batch_header=header, signatures=())
        certs.append(cert)
        dag.insert(cert)
    for c in certs:
        assert dag.get_by_id(2, c.id) is c
        assert dag.contains(c.id, 2)
    assert dag.get_by_id(2, b"\x00" * 32) is None
    dag.commit(certs[0], max_gc_rounds=50)
    assert dag.get_by_id(2, certs[0].id) is None
    assert dag.get_by_id(2, certs[1].id) is certs[1]
