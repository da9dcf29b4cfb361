"""Cross-program calls: `import <id>;` + `call <id>/<fn> ...`.

Reference parity: snarkVM programs import other on-chain programs and
call their functions; the callee runs under the calling PROGRAM's
address while `self.signer` stays the top-level account
(/root/reference — reached through snarkVM's process/stack; the node
rejects deployments whose imports are not on-chain).  The framework
supports the library-program shape (literal I/O, no callee finalize);
richer compositions halt explicitly (vm/interpreter._call_external).
"""

import pytest

from snarkos_tpu import vm as avm
from snarkos_tpu.node import ledger as L
from snarkos_tpu.vm import values as V

LIB_SRC = """program mathlib.aleo;

function cube:
    input r0 as u64.public;
    mul r0 r0 into r1;
    mul r1 r0 into r2;
    output r2 as u64.public;

function whoami:
    output self.caller as address.public;
"""

APP_SRC = """import mathlib.aleo;
program app.aleo;

mapping acc:
    key as field.public;
    value as u64.public;

function run:
    input r0 as u64.public;
    call mathlib.aleo/cube r0 into r1;
    add r1 1u64 into r2;
    async run r2 into r3;
    output r3 as app.aleo/run.future;

finalize run:
    input r0 as u64.public;
    set r0 into acc[1field];

function who:
    call mathlib.aleo/whoami into r0;
    output r0 as address.public;
"""


@pytest.fixture(scope="module")
def progs():
    lib = avm.parse_program(LIB_SRC)
    app = avm.parse_program(APP_SRC)
    return {"mathlib.aleo": lib, "app.aleo": app}


class TestParser:
    def test_imports_recorded(self, progs):
        assert progs["app.aleo"].imports == ["mathlib.aleo"]
        assert progs["mathlib.aleo"].imports == []

    def test_self_import_rejected(self):
        with pytest.raises(avm.ParseError):
            avm.parse_program("import x.aleo;\nprogram x.aleo;\n"
                              "function f:\n    add 1u8 1u8 into r0;\n")

    def test_import_after_header_rejected(self):
        with pytest.raises(avm.ParseError):
            avm.parse_program("program x.aleo;\nimport y.aleo;\n"
                              "function f:\n    add 1u8 1u8 into r0;\n")


class TestInterpreter:
    def test_cross_program_call(self, progs):
        ctx = avm.ExecContext(program=progs["app.aleo"], block_height=0,
                              tx_seed=b"t", programs=progs)
        res = avm.execute_function(progs["app.aleo"], "run",
                                   [V.Value("u64", 3)], ctx)
        assert res.finalize.args[0].val == 28  # 3^3 + 1

    def test_callee_sees_program_address_as_caller(self, progs):
        signer = "aleo1" + "7" * 64
        ctx = avm.ExecContext(program=progs["app.aleo"], caller=signer,
                              block_height=0, tx_seed=b"t", programs=progs)
        res = avm.execute_function(progs["app.aleo"], "who", [], ctx)
        assert res.outputs[0].val == avm.program_address("app.aleo")
        assert res.outputs[0].val != signer

    def test_unimported_program_halts(self, progs):
        src = APP_SRC.replace("import mathlib.aleo;\n", "")
        prog = avm.parse_program(src)
        ctx = avm.ExecContext(program=prog, block_height=0, tx_seed=b"t",
                              programs=progs)
        with pytest.raises(avm.HaltError, match="not imported"):
            avm.execute_function(prog, "run", [V.Value("u64", 3)], ctx)

    def test_missing_registry_halts(self, progs):
        ctx = avm.ExecContext(program=progs["app.aleo"], block_height=0,
                              tx_seed=b"t", programs={})
        with pytest.raises(avm.HaltError, match="not on-chain"):
            avm.execute_function(progs["app.aleo"], "run",
                                 [V.Value("u64", 3)], ctx)

    def test_callee_finalize_unsupported(self, progs):
        lib2 = avm.parse_program("""program fin.aleo;

mapping m:
    key as field.public;
    value as u64.public;

function f:
    input r0 as u64.public;
    async f r0 into r1;
    output r1 as fin.aleo/f.future;

finalize f:
    input r0 as u64.public;
    set r0 into m[1field];
""")
        app = avm.parse_program("""import fin.aleo;
program app2.aleo;

function g:
    call fin.aleo/f 1u64 into r0;
""")
        ctx = avm.ExecContext(program=app, block_height=0, tx_seed=b"t",
                              programs={"fin.aleo": lib2, "app2.aleo": app})
        with pytest.raises(avm.HaltError, match="finalize"):
            avm.execute_function(app, "g", [], ctx)


def _dev_ledger():
    from snarkos_tpu.node.cli import dev_committee
    return L.Ledger(dev_committee(2))


class TestLedger:
    def test_deploy_requires_import_on_chain(self):
        led = _dev_ledger()
        h = led.latest_block.height + 1
        # deploying app.aleo BEFORE mathlib.aleo must abort the deploy
        tx_app = L.create_transaction(APP_SRC.encode(), fee=1, is_deploy=True)
        led._apply_program_ops(tx_app, h)
        assert "app.aleo" not in led.parsed_programs
        tx_lib = L.create_transaction(LIB_SRC.encode(), fee=1, is_deploy=True)
        led._apply_program_ops(tx_lib, h)
        assert "mathlib.aleo" in led.parsed_programs
        led._apply_program_ops(tx_app, h)
        assert "app.aleo" in led.parsed_programs

    def test_execute_cross_program_commits(self):
        led = _dev_ledger()
        h = led.latest_block.height + 1
        for src in (LIB_SRC, APP_SRC):
            led._apply_program_ops(
                L.create_transaction(src.encode(), fee=1, is_deploy=True), h)
        tx = L.create_transaction(b"execute app.aleo/run 2u64", fee=1)
        led._apply_program_ops(tx, h)
        assert led.get_mapping_value("app.aleo", "acc", "1field") == "9u64"
