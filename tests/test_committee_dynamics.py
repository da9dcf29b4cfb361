"""Dynamic committee membership from on-chain bonding.

Reference semantics: the committee for round r is resolved from the ledger
with lookback (ledger-service/src/ledger.rs:156-198), driven by the
credits.aleo bond/unbond finalize state; validators join and leave at block
boundaries and the leader schedule follows
(/root/reference/node/bft/src/bft.rs:341,411-413,518).
"""

import dataclasses

import pytest

from snarkos_tpu.crypto.ref import edwards
from snarkos_tpu.node import ledger as ledger_mod
from snarkos_tpu.node.cli import dev_account, dev_committee
from snarkos_tpu.node.ledger import (
    CoreLedgerService,
    Ledger,
    create_transaction,
    make_genesis,
)
from snarkos_tpu.node.types import Block, Transmission, point_to_address, sha256d


CHARLIE = edwards.Account.new(seed=b"\x77" * 32)


def _block(ledger, round_, txs):
    prev = ledger.latest_block
    return Block(
        height=prev.height + 1,
        previous_hash=prev.hash,
        timestamp=prev.timestamp + 1,
        round=round_,
        epoch_hash=ledger._next_epoch_hash(prev.height + 1),
        proof_target=prev.proof_target,
        subdag=None,
        transmissions=tuple(Transmission.from_transaction(t) for t in txs),
    )


def _member_account(committee, index):
    accounts = {point_to_address(dev_account(i).pk): dev_account(i)
                for i in range(len(committee.members))}
    return accounts[committee.addresses[index]]


def test_bond_in_unbond_out(monkeypatch):
    monkeypatch.setattr(ledger_mod, "COMMITTEE_LOOKBACK_RANGE", 0)
    committee = dev_committee(2)
    ledger = Ledger(committee)
    a0 = _member_account(committee, 0)
    charlie = CHARLIE.address

    # fund charlie + bond in, all via signed executes riding a block
    fund = create_transaction(
        f"execute credits.aleo/transfer_public {charlie} 150u64".encode(),
        account=a0)
    bond = create_transaction(
        "execute credits.aleo/bond_public 100u64".encode(), account=CHARLIE)
    blk1 = _block(ledger, round_=2, txs=[fund, bond])
    ledger.advance_to_next_block(blk1)
    assert fund.id.digest not in ledger.aborted_tx_ids
    assert bond.id.digest not in ledger.aborted_tx_ids

    # the committee CHANGED: charlie is a member from round 3 onward
    assert len(ledger.committee_history) == 2
    new_committee = ledger.committee
    assert new_committee.is_member(charlie)
    assert new_committee.stake(charlie) == 100
    assert new_committee.starting_round == 3
    # rounds <= 2 still governed by the genesis committee
    assert not ledger.committee_for_round(2).is_member(charlie)
    assert ledger.committee_for_round(3).is_member(charlie)

    # the leader schedule provably changes: with 1/3 of the stake charlie
    # must lead some even round under the new committee and none before
    old = ledger.committee_for_round(0)
    leads = [r for r in range(4, 200, 2)
             if ledger.committee_for_round(r).get_leader(r) == charlie]
    assert leads, "new member never elected leader"
    assert all(old.get_leader(r) != charlie for r in range(4, 200, 2))

    # consensus seam resolves through the lookback (round r uses r-1/r-2)
    svc = CoreLedgerService(ledger)
    assert svc.committee_lookback_for(5).is_member(charlie)
    assert not svc.committee_lookback_for(3).is_member(charlie)  # looks at r=2

    # unbond below MIN_VALIDATOR_STAKE: charlie drops out at the next block
    unbond = create_transaction(
        "execute credits.aleo/unbond_public 60u64".encode(), account=CHARLIE)
    blk2 = _block(ledger, round_=6, txs=[unbond])
    ledger.advance_to_next_block(blk2)
    assert unbond.id.digest not in ledger.aborted_tx_ids
    assert not ledger.committee.is_member(charlie)
    assert ledger.committee.starting_round == 7
    assert ledger.committee_for_round(6).is_member(charlie)
    assert not ledger.committee_for_round(7).is_member(charlie)
    # on-chain committee mapping mirrors the derived membership
    assert ledger.get_mapping_value("credits.aleo", "committee", charlie) == "false"


def test_lookback_stability(monkeypatch):
    """With the production lookback range, a committee change does NOT
    affect the next ~100 rounds — every validator's view of 'the committee
    for round r' is stable while the bonding tx propagates."""
    committee = dev_committee(2)
    ledger = Ledger(committee)
    a0 = _member_account(committee, 0)
    fund = create_transaction(
        f"execute credits.aleo/transfer_public {CHARLIE.address} 150u64".encode(),
        account=a0)
    bond = create_transaction(
        "execute credits.aleo/bond_public 120u64".encode(), account=CHARLIE)
    ledger.advance_to_next_block(_block(ledger, round_=2, txs=[fund, bond]))
    svc = CoreLedgerService(ledger)
    # effective only once the lookback window passes the boundary round 3
    assert not svc.committee_lookback_for(10).is_member(CHARLIE.address)
    assert not svc.committee_lookback_for(102).is_member(CHARLIE.address)
    assert svc.committee_lookback_for(106).is_member(CHARLIE.address)


def test_replay_rebuilds_history(tmp_path, monkeypatch):
    """Restart from the persisted chain: the committee history is rebuilt
    deterministically from the committed bonding transactions."""
    monkeypatch.setattr(ledger_mod, "COMMITTEE_LOOKBACK_RANGE", 0)
    committee = dev_committee(2)
    path = str(tmp_path / "chain.log")
    ledger = Ledger(committee, storage_path=path)
    a0 = _member_account(committee, 0)
    fund = create_transaction(
        f"execute credits.aleo/transfer_public {CHARLIE.address} 150u64".encode(),
        account=a0)
    bond = create_transaction(
        "execute credits.aleo/bond_public 100u64".encode(), account=CHARLIE)
    ledger.advance_to_next_block(_block(ledger, round_=2, txs=[fund, bond]))
    reloaded = Ledger(committee, storage_path=path)
    assert [r for r, _ in reloaded.committee_history] == [r for r, _ in ledger.committee_history]
    assert reloaded.committee.id == ledger.committee.id
    assert reloaded.committee.is_member(CHARLIE.address)
