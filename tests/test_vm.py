"""Aleo-instructions VM: parser, typed arithmetic, execute + finalize.

Mirrors the reference's program capability surface (deploy/execute through
snarkVM's VM, reached from /root/reference/node/src/validator/mod.rs:383-391
and the CLI developer commands) at the semantic level: checked/wrapping
integer ops, field/group/scalar arithmetic, closures, structs, finalize
mapping transitions with atomic rollback, branch/position control flow,
and deterministic rand.chacha.
"""

import pytest

from snarkos_tpu import vm as avm
from snarkos_tpu.vm import values as V
from snarkos_tpu.vm.interpreter import ExecContext, MappingStore
from snarkos_tpu.vm.values import HaltError, Value

TOKEN = """\
program token.aleo;

mapping balances:
    key as address.public;
    value as u64.public;

function mint:
    input r0 as address.public;
    input r1 as u64.public;
    async mint r0 r1 into r2;
    output r2 as token.aleo/mint.future;

finalize mint:
    input r0 as address.public;
    input r1 as u64.public;
    get.or_use balances[r0] 0u64 into r2;
    add r2 r1 into r3;
    set r3 into balances[r0];

function transfer:
    input r0 as address.public;
    input r1 as u64.public;
    async transfer self.caller r0 r1 into r2;
    output r2 as token.aleo/transfer.future;

finalize transfer:
    input r0 as address.public;
    input r1 as address.public;
    input r2 as u64.public;
    get balances[r0] into r3;
    sub r3 r2 into r4;
    set r4 into balances[r0];
    get.or_use balances[r1] 0u64 into r5;
    add r5 r2 into r6;
    set r6 into balances[r1];
"""

ALICE = "aleo1" + "a" * 64
BOB = "aleo1" + "b" * 64


def _run(prog, fn, args, store, caller=ALICE, height=5, seed=b"\x01" * 32):
    ctx = ExecContext(program=prog, caller=caller, block_height=height,
                      tx_seed=seed)
    res = avm.execute_function(prog, fn, args, ctx)
    if res.finalize:
        avm.execute_finalize(prog, res.finalize, store, ctx)
    return res


def test_token_mint_transfer():
    prog = avm.parse_program(TOKEN)
    assert prog.id == "token.aleo"
    backing = {}
    store = MappingStore(backing)
    _run(prog, "mint", [Value("address", ALICE), Value("u64", 100)], store)
    assert store.get("token.aleo", "balances", ALICE) == "100u64"
    _run(prog, "transfer", [Value("address", BOB), Value("u64", 30)], store,
         caller=ALICE)
    assert store.get("token.aleo", "balances", ALICE) == "70u64"
    assert store.get("token.aleo", "balances", BOB) == "30u64"


def test_finalize_halt_rolls_back():
    """transfer with insufficient balance: the u64 sub underflows -> halt;
    NO partial mapping writes may survive (atomic rollback)."""
    prog = avm.parse_program(TOKEN)
    store = MappingStore({})
    _run(prog, "mint", [Value("address", ALICE), Value("u64", 10)], store)
    with pytest.raises(HaltError):
        _run(prog, "transfer", [Value("address", BOB), Value("u64", 50)],
             store, caller=ALICE)
    assert store.get("token.aleo", "balances", ALICE) == "10u64"
    assert store.get("token.aleo", "balances", BOB) is None


def test_group_value_roundtrip():
    """format_value emits exactly 64 hex chars + 'group' (69 chars); the
    parser must accept its own output (r2 advisory: the > 69 condition
    never matched, so self-emitted group values halted on re-parse)."""
    from snarkos_tpu.crypto.ref import edwards

    g = Value("group", edwards.scalar_mul(7, edwards.GENERATOR))
    tok = V.format_value(g)
    assert len(tok) == 69 and tok.endswith("group")
    back = V.parse_typed(tok, "group")
    assert back.ty == "group" and back.val == g.val
    # and inside a record/struct member plaintext round-trip
    from snarkos_tpu import vm as avm2

    members = avm2.parse_plaintext(f"{{ pt: {tok} }}", {"pt": "group"})
    assert members["pt"].val == g.val


def test_rem_min_by_neg_one_halts():
    """snarkVM checked_rem: iN::MIN rem -1 overflows -> halt (not 0)."""
    with pytest.raises(HaltError):
        V.rem(Value("i8", -128), Value("i8", -1))
    assert V.rem(Value("i8", -127), Value("i8", -1)).val == 0


def test_checked_vs_wrapped_arithmetic():
    with pytest.raises(HaltError):
        V.add(Value("u8", 200), Value("u8", 100))
    assert V.add_wrapped(Value("u8", 200), Value("u8", 100)).val == 44
    with pytest.raises(HaltError):
        V.sub(Value("u8", 3), Value("u8", 5))
    assert V.sub_wrapped(Value("u8", 3), Value("u8", 5)).val == 254
    with pytest.raises(HaltError):
        V.neg(Value("i8", -128))
    with pytest.raises(HaltError):
        V.div(Value("i8", -128), Value("i8", -1))
    assert V.div(Value("i8", -7), Value("i8", 2)).val == -3  # trunc toward 0
    assert V.rem(Value("i8", -7), Value("i8", 2)).val == -1
    with pytest.raises(HaltError):
        V.div(Value("u32", 1), Value("u32", 0))
    with pytest.raises(HaltError):
        V.shl(Value("u8", 1), Value("u8", 8))
    assert V.shl(Value("u8", 3), Value("u8", 2)).val == 12


def test_field_scalar_group_ops():
    p = V.FIELD_P
    a, b = Value("field", p - 1), Value("field", 2)
    assert V.add(a, b).val == 1
    assert V.mul(a, a).val == pow(p - 1, 2, p)
    assert V.div(b, a).val == 2 * pow(p - 1, -1, p) % p
    assert V.inv(b).val == pow(2, -1, p)
    g2 = V.parse_literal("2group")
    g3 = V.parse_literal("3group")
    assert V.eq_values(V.add(g2, g3), V.parse_literal("5group"))
    assert V.eq_values(V.double(g2), V.parse_literal("4group"))
    s = V.parse_literal("3scalar")
    assert V.eq_values(V.mul(g2, s), V.parse_literal("6group"))


def test_cast_checked_and_lossy():
    assert V.cast(Value("u16", 255), "u8").val == 255
    with pytest.raises(HaltError):
        V.cast(Value("u16", 256), "u8")
    assert V.cast(Value("u16", 0x1FF), "u8", lossy=True).val == 0xFF
    assert V.cast(Value("u8", 7), "field").val == 7
    assert V.cast(Value("boolean", True), "u64").val == 1


STRUCT_PROG = """\
program geometry.aleo;

struct point:
    x as u32;
    y as u32;

closure norm2:
    input r0 as point;
    mul r0.x r0.x into r1;
    mul r0.y r0.y into r2;
    add r1 r2 into r3;
    output r3 as u32;

function dist2:
    input r0 as u32.public;
    input r1 as u32.public;
    cast r0 r1 into r2 as point;
    call norm2 r2 into r3;
    output r3 as u32.public;
"""


def test_struct_and_closure_call():
    prog = avm.parse_program(STRUCT_PROG)
    ctx = ExecContext(program=prog)
    res = avm.execute_function(
        prog, "dist2", [Value("u32", 3), Value("u32", 4)], ctx)
    assert res.outputs[0] == Value("u32", 25)
    assert res.finalize is None


LOOP_PROG = """\
program counter.aleo;

mapping tally:
    key as u8.public;
    value as u64.public;

function bump:
    input r0 as u8.public;
    async bump r0 into r1;
    output r1 as counter.aleo/bump.future;

finalize bump:
    input r0 as u8.public;
    get.or_use tally[r0] 0u64 into r1;
    position top;
    add r1 1u64 into r1;
    lt r1 5u64 into r2;
    branch.eq r2 true to top;
    set r1 into tally[r0];
"""


def test_finalize_branch_loop():
    prog = avm.parse_program(LOOP_PROG)
    store = MappingStore({})
    _run(prog, "bump", [Value("u8", 1)], store)
    # loops until r1 == 5
    assert store.get("counter.aleo", "tally", "1u8") == "5u64"


RAND_PROG = """\
program lottery.aleo;

mapping winners:
    key as u8.public;
    value as u64.public;

function draw:
    async draw into r0;
    output r0 as lottery.aleo/draw.future;

finalize draw:
    rand.chacha into r0 as u64;
    set r0 into winners[0u8];
"""


def test_rand_chacha_deterministic():
    prog = avm.parse_program(RAND_PROG)
    s1, s2 = MappingStore({}), MappingStore({})
    _run(prog, "draw", [], s1, height=9, seed=b"\x07" * 32)
    _run(prog, "draw", [], s2, height=9, seed=b"\x07" * 32)
    assert s1.get("lottery.aleo", "winners", "0u8") == \
        s2.get("lottery.aleo", "winners", "0u8")
    s3 = MappingStore({})
    _run(prog, "draw", [], s3, height=10, seed=b"\x07" * 32)
    assert s3.get("lottery.aleo", "winners", "0u8") != \
        s1.get("lottery.aleo", "winners", "0u8")


def test_parse_errors():
    with pytest.raises(avm.ParseError):
        avm.parse_program("function f:\n  add r0 r1 into r2;")  # no header
    with pytest.raises(avm.ParseError):
        avm.parse_program("program x.aleo;\nimport credits.aleo;")
    with pytest.raises(avm.ParseError):
        avm.parse_program("program x.aleo;\nfunction f:\n  frobnicate r0 into r1;")
    with pytest.raises(avm.ParseError):
        # mapping ops outside finalize
        avm.parse_program(
            "program x.aleo;\nmapping m:\n  key as u8.public;\n"
            "  value as u8.public;\nfunction f:\n  get m[0u8] into r0;")
    with pytest.raises(avm.ParseError):
        # async without finalize block
        avm.parse_program(
            "program x.aleo;\nfunction f:\n  async f into r0;")


def test_assert_and_ternary():
    prog = avm.parse_program("""\
program guard.aleo;

function clamp:
    input r0 as u32.public;
    input r1 as u32.public;
    assert.neq r1 0u32;
    gt r0 r1 into r2;
    ternary r2 r1 r0 into r3;
    output r3 as u32.public;
""")
    ctx = ExecContext(program=prog)
    out = avm.execute_function(prog, "clamp",
                               [Value("u32", 9), Value("u32", 5)], ctx)
    assert out.outputs[0].val == 5
    with pytest.raises(HaltError):
        avm.execute_function(prog, "clamp",
                             [Value("u32", 9), Value("u32", 0)], ctx)


def test_ledger_integration():
    """Deploy + execute through the ledger commit path (program ops are
    applied on block indexing; aborted executions leave no state). Callers
    are bound with caller:/sig: tokens (create_transaction(account=...))."""
    from snarkos_tpu.crypto.ref import edwards
    from snarkos_tpu.node.cli import dev_committee
    from snarkos_tpu.node.ledger import Ledger, create_transaction
    from snarkos_tpu.node.types import point_to_address

    acct = edwards.Account.new(seed=b"\x0a" * 32)
    alice = point_to_address(acct.pk)
    committee = dev_committee(2)
    ledger = Ledger(committee)
    deploy = create_transaction(TOKEN.encode(), is_deploy=True)
    good = create_transaction(
        f"execute token.aleo/mint {alice} 42u64".encode(), account=acct)
    bad = create_transaction(  # transfer more than the balance -> aborted
        f"execute token.aleo/transfer {BOB} 999u64".encode(), account=acct)
    for i, tx in enumerate((deploy, good, bad)):
        ledger._apply_program_ops(tx, block_height=i + 1)
    assert "token.aleo" in ledger.programs
    assert ledger.get_mapping_value("token.aleo", "balances", alice) == "42u64"
    assert bad.id.digest in ledger.aborted_tx_ids
    assert ledger.get_mapping_value("token.aleo", "balances", BOB) is None


def test_ledger_caller_must_be_signed():
    """An unsigned (or wrongly-signed) caller token must abort the
    execution: otherwise any party could debit arbitrary accounts by
    naming them as caller (r2 advisory, high)."""
    from snarkos_tpu.crypto.ref import edwards
    from snarkos_tpu.node.cli import dev_committee
    from snarkos_tpu.node.ledger import Ledger, create_transaction
    from snarkos_tpu.node.types import point_to_address

    acct = edwards.Account.new(seed=b"\x0a" * 32)
    alice = point_to_address(acct.pk)
    attacker = edwards.Account.new(seed=b"\x0b" * 32)
    committee = dev_committee(2)
    ledger = Ledger(committee)
    ledger._apply_program_ops(
        create_transaction(TOKEN.encode(), is_deploy=True), 1)
    ledger._apply_program_ops(create_transaction(
        f"execute token.aleo/mint {alice} 42u64".encode(), account=acct), 2)

    # 1. bare caller token with no signature
    naked = create_transaction(
        f"execute token.aleo/transfer caller:{alice} {BOB} 10u64".encode())
    ledger._apply_program_ops(naked, 3)
    assert naked.id.digest in ledger.aborted_tx_ids
    # 2. signature by a DIFFERENT account over alice's caller token
    from snarkos_tpu.node.ledger import caller_auth_message

    forged_unsigned = f"execute token.aleo/transfer caller:{alice} {BOB} 10u64"
    sig = edwards.sign_bytes(attacker.sk, attacker.pk,
                             caller_auth_message(forged_unsigned.encode(), 0))
    toks = forged_unsigned.split()
    forged = " ".join(toks[:3] + [f"sig:{sig[0]:064x}{sig[1]:064x}"] + toks[3:])
    bad = create_transaction(forged.encode())
    ledger._apply_program_ops(bad, 4)
    assert bad.id.digest in ledger.aborted_tx_ids
    # balance untouched either way
    assert ledger.get_mapping_value("token.aleo", "balances", alice) == "42u64"
    # 3. the genuine owner's signature works
    ok = create_transaction(
        f"execute token.aleo/transfer {BOB} 10u64".encode(), account=acct)
    ledger._apply_program_ops(ok, 5)
    assert ok.id.digest not in ledger.aborted_tx_ids
    assert ledger.get_mapping_value("token.aleo", "balances", alice) == "32u64"
    assert ledger.get_mapping_value("token.aleo", "balances", BOB) == "10u64"


def test_genesis_quorum_state():
    """make_genesis (vm.genesis_quorum capability, start.rs:764-767):
    block 0 carries a proven credits.aleo deployment and indexing it
    applies bonded/committee/account ratifications for every member."""
    from snarkos_tpu.node.cli import dev_committee
    from snarkos_tpu.node.ledger import (GENESIS_STARTING_BALANCE, Ledger,
                                         create_transaction, make_genesis)

    committee = dev_committee(2)
    blk = make_genesis(committee)
    assert blk.height == 0 and len(blk.transmissions) == 1
    assert make_genesis(committee).hash == blk.hash  # deterministic + cached

    ledger = Ledger(committee)
    assert "credits.aleo" in ledger.programs
    assert "credits.aleo" in ledger.parsed_programs
    for addr, stake, _ in committee.members:
        assert ledger.get_mapping_value("credits.aleo", "bonded", addr) == f"{stake}u64"
        assert ledger.get_mapping_value("credits.aleo", "committee", addr) == "true"
        assert ledger.get_mapping_value(
            "credits.aleo", "account", addr) == f"{GENESIS_STARTING_BALANCE}u64"

    # a committed transfer_public moves public credits between accounts
    # (caller signed by the matching dev account)
    from snarkos_tpu.node.cli import dev_account
    from snarkos_tpu.node.types import point_to_address

    accounts = {point_to_address(dev_account(i).pk): dev_account(i)
                for i in range(2)}
    a0, a1 = committee.addresses[0], committee.addresses[1]
    tx = create_transaction(
        f"execute credits.aleo/transfer_public {a1} 5u64".encode(),
        account=accounts[a0])
    ledger._apply_program_ops(tx, block_height=1)
    bal0 = ledger.get_mapping_value("credits.aleo", "account", a0)
    bal1 = ledger.get_mapping_value("credits.aleo", "account", a1)
    assert bal0 == f"{GENESIS_STARTING_BALANCE - 5}u64"
    assert bal1 == f"{GENESIS_STARTING_BALANCE + 5}u64"

    # bond/unbond round-trip
    tx2 = create_transaction(
        f"execute credits.aleo/bond_public 7u64".encode(),
        account=accounts[a0])
    ledger._apply_program_ops(tx2, block_height=2)
    assert ledger.get_mapping_value("credits.aleo", "bonded", a0) == "107u64"


PTOKEN = """\
program ptoken.aleo;

record coin:
    owner as address.private;
    amount as u64.private;

function mint_private:
    input r0 as address.private;
    input r1 as u64.private;
    cast r0 r1 into r2 as coin.record;
    output r2 as coin.record;

function transfer_private:
    input r0 as coin.record;
    input r1 as address.private;
    input r2 as u64.private;
    sub r0.amount r2 into r3;
    cast r0.owner r3 into r4 as coin.record;
    cast r1 r2 into r5 as coin.record;
    output r4 as coin.record;
    output r5 as coin.record;

function join:
    input r0 as coin.record;
    input r1 as coin.record;
    add r0.amount r1.amount into r2;
    cast r0.owner r2 into r3 as coin.record;
    output r3 as coin.record;
"""


def test_records_mint_transfer_seal_open():
    from snarkos_tpu.crypto.ref import edwards
    from snarkos_tpu.node.types import point_to_address

    prog = avm.parse_program(PTOKEN)
    assert list(prog.records["coin"].members) == ["owner", "amount"]
    acct = edwards.Account.new(seed=b"\x05" * 32)
    owner = point_to_address(acct.pk)
    ctx = ExecContext(program=prog, caller=owner)
    res = avm.execute_function(
        prog, "mint_private", [Value("address", owner), Value("u64", 90)], ctx)
    (rec,) = res.outputs
    assert rec.ty == "coin" and rec.val["amount"].val == 90

    sealed = avm.seal_record(prog.id, "coin", rec)
    assert sealed.startswith(b"record1")
    # only the owner opens it
    name, opened = avm.open_record(acct.sk, sealed, prog)
    assert name == "coin" and opened.val["amount"].val == 90
    other = edwards.Account.new(seed=b"\x06" * 32)
    with pytest.raises(ValueError):
        avm.open_record(other.sk, sealed, prog)

    # spend: transfer 30 to bob -> change record + new record
    res2 = avm.execute_function(
        prog, "transfer_private",
        [opened, Value("address", BOB), Value("u64", 30)], ctx)
    change, out = res2.outputs
    assert change.val["amount"].val == 60 and change.val["owner"].val == owner
    assert out.val["amount"].val == 30 and out.val["owner"].val == BOB
    # overdraw halts
    with pytest.raises(HaltError):
        avm.execute_function(
            prog, "transfer_private",
            [opened, Value("address", BOB), Value("u64", 1000)], ctx)


def test_records_ledger_spend_and_double_spend():
    from snarkos_tpu.crypto.ref import edwards
    from snarkos_tpu.node.cli import dev_committee
    from snarkos_tpu.node.ledger import Ledger, create_transaction
    from snarkos_tpu.node.types import point_to_address
    from snarkos_tpu.vm.values import format_value

    committee = dev_committee(2)
    ledger = Ledger(committee)
    ledger._apply_program_ops(
        create_transaction(PTOKEN.encode(), is_deploy=True), 1)
    acct = edwards.Account.new(seed=b"\x07" * 32)
    owner = point_to_address(acct.pk)
    bob = point_to_address(edwards.Account.new(seed=b"\x08" * 32).pk)

    mint = create_transaction(
        f"execute ptoken.aleo/mint_private {owner} 50u64".encode(), account=acct)
    ledger._apply_program_ops(mint, 2)
    blobs = ledger.record_ciphertexts.get(2, [])
    assert len(blobs) == 1
    prog = ledger.parsed_programs["ptoken.aleo"]
    from snarkos_tpu import vm as avm2

    _, rec = avm2.open_record(acct.sk, blobs[0], prog)

    rec_hex = format_value(rec).encode().hex()
    spend = create_transaction(
        f"execute ptoken.aleo/transfer_private record:{rec_hex} {bob} 20u64".encode(),
        account=acct)
    ledger._apply_program_ops(spend, 3)
    assert spend.id.digest not in ledger.aborted_tx_ids
    assert len(ledger.record_ciphertexts.get(3, [])) == 2  # change + output

    # replaying the same record input is a double spend -> aborted
    spend2 = create_transaction(
        f"execute ptoken.aleo/transfer_private record:{rec_hex} {bob} 5u64".encode(),
        account=acct)
    ledger._apply_program_ops(spend2, 4)
    assert spend2.id.digest in ledger.aborted_tx_ids
    assert not ledger.record_ciphertexts.get(4)

    # the SAME record passed twice in ONE transaction is also a double
    # spend (r2 advisory: within-tx serial cross-check — a join-style
    # function would otherwise count the value twice)
    mint2 = create_transaction(
        f"execute ptoken.aleo/mint_private {owner} 8u64".encode(), account=acct)
    ledger._apply_program_ops(mint2, 5)
    (blob2,) = ledger.record_ciphertexts[5]
    _, rec2 = avm2.open_record(acct.sk, blob2, prog)
    rec2_hex = format_value(rec2).encode().hex()
    dbl = create_transaction(
        f"execute ptoken.aleo/join record:{rec2_hex} record:{rec2_hex}".encode(),
        account=acct)
    ledger._apply_program_ops(dbl, 6)
    assert dbl.id.digest in ledger.aborted_tx_ids
    # a join of two DISTINCT records succeeds (rec2 + a third mint)
    mint3 = create_transaction(
        f"execute ptoken.aleo/mint_private {owner} 3u64".encode(), account=acct)
    ledger._apply_program_ops(mint3, 7)
    (blob3,) = ledger.record_ciphertexts[7]
    _, rec3 = avm2.open_record(acct.sk, blob3, prog)
    rec3_hex = format_value(rec3).encode().hex()
    join = create_transaction(
        f"execute ptoken.aleo/join record:{rec2_hex} record:{rec3_hex}".encode(),
        account=acct)
    ledger._apply_program_ops(join, 8)
    assert join.id.digest not in ledger.aborted_tx_ids
