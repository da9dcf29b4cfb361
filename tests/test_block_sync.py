"""Block-sync parity suite (node/sync/src/block_sync.rs behaviors):
common-ancestor map, consistent-peer selection, expected-hash request
construction with redundancy escalation, malicious-peer eviction mid-sync,
and a 30-block gap synced end to end."""

import asyncio
import time

import pytest

from snarkos_tpu.node import block_sync as bs
from snarkos_tpu.node import messages as msg
from snarkos_tpu.node.block_sync import BlockSync, DUMMY_SELF, _pair
from snarkos_tpu.node.cli import dev_committee
from snarkos_tpu.node.ledger import CoreLedgerService, Ledger
from snarkos_tpu.node.types import Block


def _grow(ledger: Ledger, n: int, salt: int = 0) -> None:
    for i in range(n):
        prev = ledger.latest_block
        ledger.advance_to_next_block(Block(
            height=prev.height + 1, previous_hash=prev.hash,
            timestamp=prev.timestamp + 1 + salt, round=2 * (prev.height + 1),
            epoch_hash=ledger._next_epoch_hash(prev.height + 1),
            proof_target=prev.proof_target, subdag=None, transmissions=()))


class _NoCheck(CoreLedgerService):
    def check_next_block(self, block):
        pass


def _engine(committee, sent):
    svc = _NoCheck(Ledger(committee))
    return svc, BlockSync(svc, lambda peer, req: sent.append((peer, req)))


@pytest.fixture()
def committee():
    return dev_committee(1)


def test_common_ancestor_map(committee):
    """Locator updates maintain self- and pairwise common ancestors,
    stopping at the first bifurcation (block_sync.rs:391-439)."""
    src = Ledger(committee)
    _grow(src, 12)
    fork = Ledger(committee)
    _grow(fork, 6, salt=7)   # diverges right after genesis
    sent = []
    svc, sync = _engine(committee, sent)
    _grow(svc.ledger, 4, salt=0)

    # peerA follows the same chain as our ledger (same deterministic blocks)
    ours = Ledger(committee)
    _grow(ours, 10)
    loc_a = ours.latest_block_locators()
    assert sync.update_peer_locators("peerA", loc_a)
    # self-ancestor = our height (4): every canon hash matches peerA's chain
    assert sync.common_ancestors[_pair(DUMMY_SELF, "peerA")] == 4

    # peerB is on a fork from genesis (salted chain): ancestor = 0
    _grow(fork, 4, salt=7)
    loc_b = fork.latest_block_locators()
    assert sync.update_peer_locators("peerB", loc_b)
    assert sync.common_ancestors[_pair(DUMMY_SELF, "peerB")] == 0
    # pairwise A-B ancestor exists and is genesis only
    assert sync.common_ancestors[_pair("peerA", "peerB")] == 0


def test_find_sync_peers_excludes_forked_cohort(committee):
    """Peer selection keeps only peers whose pairwise ancestor with the
    tallest peer is above canon (block_sync.rs:718-760)."""
    sent = []
    svc, sync = _engine(committee, sent)
    main = Ledger(committee)
    _grow(main, 20)
    fork = Ledger(committee)
    _grow(fork, 18, salt=3)

    short = Ledger(committee)
    _grow(short, 15)
    assert sync.update_peer_locators("tall", main.latest_block_locators())
    assert sync.update_peer_locators("mid", short.latest_block_locators())
    assert sync.update_peer_locators("forked", fork.latest_block_locators())
    found = sync.find_sync_peers()
    assert found is not None
    peers, min_ca = found
    assert "tall" in peers and "mid" in peers
    assert "forked" not in peers
    assert min_ca == 15  # the cohort's minimum common ancestor


def test_request_timeout_and_completeness(committee):
    """600 s timeout removes only INCOMPLETE requests; obsolete heights are
    dropped (block_sync.rs:672-716)."""
    sent = []
    svc, sync = _engine(committee, sent)
    sync.requests[5] = (None, None, {"p1"})          # incomplete
    sync.requests[6] = (None, None, set())           # complete
    sync.request_times[5] = time.time() - bs.BLOCK_REQUEST_TIMEOUT_S - 1
    sync.request_times[6] = time.time() - bs.BLOCK_REQUEST_TIMEOUT_S - 1
    sync._gc_timed_out_requests()
    assert 5 not in sync.requests
    assert 6 in sync.requests
    # fresh incomplete requests survive
    sync.requests[7] = (None, None, {"p1"})
    sync.request_times[7] = time.time()
    sync._gc_timed_out_requests()
    assert 7 in sync.requests


def test_redundancy_escalation_on_dishonest_locators(committee):
    """Disagreeing locator hashes escalate to EXTRA_REDUNDANCY_FACTOR sync
    ips; an honest confirmed hash needs one (construct_request,
    block_sync.rs:869-928)."""
    sent = []
    svc, sync = _engine(committee, sent)
    main = Ledger(committee)
    _grow(main, 8)
    fork = Ledger(committee)
    _grow(fork, 8, salt=9)

    honest = main.latest_block_locators()
    lying = fork.latest_block_locators()
    # honest-only cohort: expected hash confirmed -> 1 sync ip per request
    reqs = sync._construct_requests({"a": honest}, min_ca=8)
    assert reqs and all(n == 1 and h is not None for _, (h, _, n) in reqs)
    # disagreeing cohort: no expected hash, escalation (needs >= 3 peers)
    cohort = {"a": honest, "b": lying, "c": honest}
    reqs = sync._construct_requests(cohort, min_ca=8)
    assert reqs and all(n == bs.EXTRA_REDUNDANCY_FACTOR and h is None
                        for _, (h, _, n) in reqs)


@pytest.mark.asyncio
async def test_thirty_block_gap_sync_with_malicious_peer(committee):
    """Sync a 30-block gap; a malicious peer serving a conflicting block
    loses its requests mid-sync and the honest peer completes the sync."""
    src = Ledger(committee)
    _grow(src, 30)
    evil = Ledger(committee)
    _grow(evil, 30, salt=13)

    sent = []
    svc, sync = _engine(committee, sent)
    loc = src.latest_block_locators()
    assert sync.update_peer_locators("honest", loc)
    assert sync.update_peer_locators("evil", loc)  # evil ADVERTISES the honest chain
    assert not sync.is_block_synced()
    await sync.try_block_sync()
    assert sent, "no requests issued"

    # serve: evil answers its requests with forked blocks, honest with real ones
    for peer, req in list(sent):
        if peer == "evil":
            blocks = [evil.get_block(h) for h in range(req.start_height,
                                                       min(req.end_height, 31))]
        else:
            blocks = [src.get_block(h) for h in range(req.start_height,
                                                      min(req.end_height, 31))]
        await sync.insert_block_responses(peer, blocks)

    # the conflicting block was rejected against the expected locator hash
    # and evil's outstanding requests were revoked
    assert all("evil" not in ips for _, _, ips in sync.requests.values())

    # keep syncing: evil keeps lying (each lie revokes its outstanding
    # requests so the heights are re-assigned), honest serves correctly
    for _ in range(60):
        if svc.latest_height() == 30:
            break
        sent.clear()
        await sync.try_block_sync()
        for peer, req in list(sent):
            chain = src if peer == "honest" else evil
            blocks = [chain.get_block(h) for h in range(req.start_height,
                                                        min(req.end_height, 31))]
            await sync.insert_block_responses(peer, blocks)
    assert svc.latest_height() == 30
    assert sync.is_block_synced()


@pytest.mark.asyncio
async def test_response_from_unrequested_peer_rejected(committee):
    """A block response from a peer the pool never asked is rejected
    (check_block_response, block_sync.rs:570-607)."""
    src = Ledger(committee)
    _grow(src, 5)
    sent = []
    svc, sync = _engine(committee, sent)
    assert sync.update_peer_locators("peerA", src.latest_block_locators())
    await sync.try_block_sync()
    assert sent
    await sync.insert_block_responses("stranger", [src.get_block(1)])
    assert svc.latest_height() == 0  # nothing advanced
