"""BHP hash + record encryption + new CLI/REST surfaces
(SURVEY.md §2.10 BHP256 row; §2.9 developer decrypt/transfer_private)."""

import hashlib

import pytest

from snarkos_tpu.crypto.ref import bhp, edwards, records


# -- BHP ---------------------------------------------------------------------

def test_bhp_deterministic_and_collision_resistant_shape():
    d1 = bhp.bhp256(b"abc")
    assert d1 == bhp.bhp256(b"abc")
    assert d1 != bhp.bhp256(b"abd")
    assert len(d1) == 32


def test_bhp_length_extension_guard():
    # same bits, different lengths must differ (length-prefixed)
    assert bhp.hash_bits([1, 0, 1]) != bhp.hash_bits([1, 0, 1, 0])
    assert bhp.hash_bits([]) != bhp.hash_bits([0])


def test_bhp_long_input_chains_blocks():
    data = bytes(range(256)) * 3  # > one 513-bit block
    d = bhp.hash_bytes(data)
    assert 0 < d < bhp.R
    assert d != bhp.hash_bytes(data[:-1])


def test_bhp_bases_on_curve_and_in_subgroup():
    for pt in bhp.bases()[:8]:
        assert edwards.on_curve(pt)
        assert edwards.scalar_mul(edwards.ORDER, pt) == edwards.IDENTITY


# -- records -----------------------------------------------------------------

def test_record_roundtrip_and_ownership():
    owner = edwards.Account.new(seed=b"\x01" * 32)
    outsider = edwards.Account.new(seed=b"\x02" * 32)
    rec = records.encrypt(owner.pk, b"42 credits to alice", ephemeral=999)
    assert records.decrypt(owner.sk, rec) == b"42 credits to alice"
    with pytest.raises(ValueError):
        records.decrypt(outsider.sk, rec)


def test_record_tamper_detected():
    owner = edwards.Account.new(seed=b"\x03" * 32)
    rec = bytearray(records.encrypt(owner.pk, b"payload", ephemeral=7))
    rec[-1] ^= 1
    with pytest.raises(ValueError):
        records.decrypt(owner.sk, bytes(rec))


def test_record_empty_and_large_payloads():
    owner = edwards.Account.new(seed=b"\x04" * 32)
    for payload in (b"", b"x" * 5000):
        rec = records.encrypt(owner.pk, payload)
        assert records.decrypt(owner.sk, rec) == payload


# -- CLI surfaces -------------------------------------------------------------

def test_cli_decrypt_roundtrip(capsys):
    from snarkos_tpu.node.cli import main

    seed_str = "test-view-key"
    acct = edwards.Account.new(seed=hashlib.sha256(seed_str.encode()).digest())
    rec = records.encrypt(acct.pk, b"private hello")
    rc = main(["developer", "decrypt", "--seed", seed_str,
               "--record", "record1" + rec.hex()])
    assert rc == 0
    assert "private hello" in capsys.readouterr().out


def test_cli_decrypt_wrong_key_fails(capsys):
    from snarkos_tpu.node.cli import main

    acct = edwards.Account.new(seed=hashlib.sha256(b"right").digest())
    rec = records.encrypt(acct.pk, b"secret")
    rc = main(["developer", "decrypt", "--seed", "wrong-key",
               "--record", "record1" + rec.hex()])
    assert rc == 1


def test_cli_transfer_private_creates_owned_record(capsys):
    """developer transfer-private (r5 real-record surface): the emitted
    transaction's sealed record-output ciphertext must decrypt for the
    RECIPIENT to a credits record of the transferred amount (the wire
    carries only serial + commitments — test_zk_privacy covers hiding;
    this covers recipient ownership end-to-end through the CLI)."""
    from snarkos_tpu import vm as avm
    from snarkos_tpu.node import ledger as L
    from snarkos_tpu.node.cli import main
    from snarkos_tpu.node.types import Reader, Transaction, point_to_address
    from snarkos_tpu.vm import values as V

    seed = "cli-rec-test"
    sender = edwards.Account.new(seed=hashlib.sha256(seed.encode()).digest())
    recipient = edwards.Account.new(seed=hashlib.sha256(b"bob").digest())
    rcpt_addr = point_to_address(recipient.pk)
    rec = V.Value("credits", {
        "owner": V.Value("address", point_to_address(sender.pk)),
        "microcredits": V.Value("u64", 5000),
    })
    ct = avm.seal_record("credits.aleo", "credits", rec)
    rc = main(["developer", "transfer-private", "--seed", seed,
               "--record", ct.hex(), "--recipient", rcpt_addr,
               "--amount", "10"])
    assert rc == 0
    out = capsys.readouterr().out
    tx_hex = out.strip().splitlines()[-1]
    tx = Transaction.from_reader(Reader(bytes.fromhex(tx_hex)))
    # the recipient can open their sealed output record
    recct_toks = [t for t in tx.exec_outs.decode().split()
                  if t.startswith("recct:")]
    assert recct_toks, "no sealed record outputs on the wire"
    opened = []
    for t in recct_toks:
        try:
            name, val = avm.open_record(
                recipient.sk, bytes.fromhex(t[len("recct:"):]),
                L.credits_program())
            opened.append((name, val))
        except ValueError:
            continue  # the sender's change record
    assert len(opened) == 1
    name, val = opened[0]
    assert name == "credits"
    assert val.val["owner"].val == rcpt_addr
    assert val.val["microcredits"].val == 10
    # and the tx itself fully verifies (auth + execution proof + pairings)
    assert L.verify_transaction(tx)
