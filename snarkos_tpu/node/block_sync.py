"""Block sync engine (node/sync/src/block_sync.rs semantics).

Transport-generic (CommunicationService seam: works over the Router for
clients/provers and over the Gateway for validators — SURVEY.md §2.7):
tracks peers' block locators, builds a common-ancestor map, issues
chunked block requests (<= 5 blocks, <= 50 outstanding, redundant peers),
checks cross-peer response consistency, and advances the ledger
sequentially.
"""

from __future__ import annotations

import asyncio
import logging
import random
import time
from typing import Callable, Optional

from snarkos_tpu.node import messages as msg
from snarkos_tpu.node.types import Block

log = logging.getLogger(__name__)

# block_sync.rs:42-52 equivalents
REDUNDANCY_FACTOR = 1
NUM_SYNC_CANDIDATE_PEERS = 15
BLOCK_REQUEST_TIMEOUT_S = 60.0
MAX_BLOCK_REQUESTS = 50
MAX_BLOCKS_BEHIND = 1


class BlockSync:
    def __init__(self, ledger_service, send_fn: Callable):
        """send_fn(peer, BlockRequest) — the communication seam."""
        self.ledger = ledger_service
        self.send_fn = send_fn
        self.peer_locators: dict = {}  # peer -> BlockLocators
        self.requests: dict[int, set] = {}  # height -> peers asked
        self.responses: dict[int, Block] = {}
        self.request_times: dict[int, float] = {}
        self.lock = asyncio.Lock()

    # -- peer state ----------------------------------------------------------
    def update_peer_locators(self, peer, locators: msg.BlockLocators) -> bool:
        """Returns False (peer should be dropped) on inconsistency."""
        if not locators.is_well_formed():
            return False
        for other in self.peer_locators.values():
            if not locators.is_consistent_with(other):
                return False
        self.peer_locators[peer] = locators
        return True

    def remove_peer(self, peer) -> None:
        self.peer_locators.pop(peer, None)
        for h in list(self.requests):
            self.requests[h].discard(peer)

    def greatest_peer_height(self) -> int:
        return max((l.latest_height for l in self.peer_locators.values()), default=0)

    def is_block_synced(self) -> bool:
        return self.greatest_peer_height() - self.ledger.latest_height() <= MAX_BLOCKS_BEHIND

    def num_blocks_behind(self) -> int:
        return max(0, self.greatest_peer_height() - self.ledger.latest_height())

    # -- the sync cycle (block_sync.rs:224-307) ------------------------------
    async def try_block_sync(self) -> None:
        async with self.lock:
            self._gc_timed_out_requests()
            await self._advance_with_responses()
            current = self.ledger.latest_height()
            target = self.greatest_peer_height()
            if target <= current:
                return
            # pick sync peers that can serve heights above us
            sync_peers = [
                p for p, l in self.peer_locators.items() if l.latest_height > current
            ][:NUM_SYNC_CANDIDATE_PEERS]
            if not sync_peers:
                return
            outstanding = len(self.requests)
            next_height = current + 1
            while outstanding < MAX_BLOCK_REQUESTS and next_height <= target:
                # skip heights already requested or buffered
                if next_height in self.requests or next_height in self.responses:
                    next_height += 1
                    continue
                end = min(next_height + msg.DATA_BLOCKS_MAX, target + 1)
                end = min(end, next_height + msg.DATA_BLOCKS_MAX)
                peers = random.sample(sync_peers, min(REDUNDANCY_FACTOR, len(sync_peers)))
                for h in range(next_height, end):
                    self.requests[h] = set(peers)
                    self.request_times[h] = time.time()
                for peer in peers:
                    self.send_fn(peer, msg.BlockRequest(next_height, end))
                outstanding += end - next_height
                next_height = end

    def _gc_timed_out_requests(self):
        now = time.time()
        for h in [h for h, t in self.request_times.items() if now - t > BLOCK_REQUEST_TIMEOUT_S]:
            self.requests.pop(h, None)
            self.request_times.pop(h, None)

    # -- responses (block_sync.rs:513-550) -----------------------------------
    async def insert_block_responses(self, peer, blocks: list[Block]) -> None:
        async with self.lock:
            for block in blocks:
                existing = self.responses.get(block.height)
                if existing is not None and existing.hash != block.hash:
                    # cross-peer mismatch: drop this peer's requests
                    log.warning("sync: conflicting block %d from %s", block.height, peer)
                    self.remove_peer(peer)
                    return
                if block.height > self.ledger.latest_height():
                    self.responses[block.height] = block
            await self._advance_with_responses()

    async def _advance_with_responses(self) -> None:
        """Sequential check + advance (block_sync.rs:349-369)."""
        while True:
            next_height = self.ledger.latest_height() + 1
            block = self.responses.get(next_height)
            if block is None:
                return
            try:
                await asyncio.get_event_loop().run_in_executor(
                    None, self._check_and_advance, block
                )
            except Exception as exc:
                log.warning("sync: invalid block %d: %s", next_height, exc)
                self.responses.pop(next_height, None)
                return
            self.responses.pop(next_height, None)
            self.requests.pop(next_height, None)
            self.request_times.pop(next_height, None)

    def _check_and_advance(self, block: Block):
        self.ledger.check_next_block(block)
        self.ledger.advance_to_next_block(block)
