"""R1CS synthesis of Aleo-instructions function bodies — execution proofs.

The reference verifies, on every gossiped transaction, Varuna proofs of
the actual function execution (snarkVM's synthesizer compiles each
function to a circuit; proofs are created at
/root/reference/cli/src/commands/developer/execute.rs:88 and verified via
/root/reference/node/bft/ledger-service/src/ledger.rs:319-341).  This
module is the framework's own circuit compiler: it walks a function's
instruction list symbolically, emitting R1CS constraints over Fr
(crypto/ref/r1cs.py) whose satisfying assignments are exactly the valid
register traces.  The same walk in *trace mode* (concrete arguments)
produces the witness.

Statement layout (public inputs, power-of-two padded):

    [0] 1
    [1] fid       Poseidon binding of "<program>/<function>"
    [2] caller    Poseidon binding of the caller address (0 = anonymous)
    [3] C_in      Poseidon commitment to ALL private inputs (record
                  members + .private literals, in declaration order,
                  plus a hiding blind); constrained to 0 when the
                  function has no private inputs
    [..] then, in INPUT declaration order:
           record input  -> its serial (public; in-circuit Poseidon of
                            the member wires — double-spend tag)
           .public input -> its value field
           .private input -> (no slot; witness wire absorbed into C_in)
    [..] finalize args (always public: the on-chain state transition)
    [..] then, in OUTPUT declaration order:
           future        -> (no slot; finalize args already bound)
           record output -> commitment C_rec = Poseidon(members, blind)
           .public output -> its value field
           .private output -> (no slot; absorbed into C_privout)
    [last allocated] C_privout  (0 when no private literal outputs)

ZK semantics (r4 verdict #3/#5): private inputs and outputs are WITNESS
wires — the verifier rebuilds only fid/caller/serials/public literals
from the payload and claimed outputs and learns nothing else beyond the
hiding Poseidon commitments. Record ownership is enforced in-circuit
(owner member == caller slot) and record serials are derived in-circuit
(Poseidon over the member wires), so a spent record's plaintext never
appears on the wire. Checked integer semantics map to range
constraints: an overflowing trace has no satisfying assignment, so a
HaltError execution is unprovable — the circuit enforces the
interpreter's halt semantics rather than modelling them.

Functions using constructs outside the supported subset (structs,
group/scalar ops, signed ints, non-field hashes, closures) raise
``SynthesisUnsupported``; such functions remain enforced by public
re-execution (node/ledger.py), exactly as before.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

from snarkos_tpu.crypto import params
from snarkos_tpu.crypto.ref import poseidon
from snarkos_tpu.crypto.ref.r1cs import R1CS, LinComb, _lc_add, _lc_scale, _poseidon_circuit
from snarkos_tpu.vm import values as V
from snarkos_tpu.vm.program import Function, Program

R = params.FR_MODULUS

FID_DOMAIN = "snarkos_tpu.vm.fid"
HASH_DOMAIN = "snarkos_tpu.vm.hash.psd2"
ADDR_DOMAIN = "snarkos_tpu.vm.addr"
RID_DOMAIN = "snarkos_tpu.vm.rid"          # record-type binding id
PRIV_DOMAIN = "snarkos_tpu.vm.priv"        # C_in: private-input commitment
SERIAL_DOMAIN = "snarkos_tpu.vm.serial"    # record serial (in-circuit)
RECOUT_DOMAIN = "snarkos_tpu.vm.recout"    # record-output commitments
PRIVOUT_DOMAIN = "snarkos_tpu.vm.privout"  # private-literal-output commitment


class SynthesisUnsupported(Exception):
    """The function uses constructs outside the provable subset."""


UINT_BITS = {"u8": 8, "u16": 16, "u32": 32, "u64": 64, "u128": 128}
# literal types a circuit value can carry; 'address' is an opaque field
CIRCUIT_TYPES = set(UINT_BITS) | {"field", "boolean", "address"}


@dataclass
class CVal:
    ty: str
    lc: LinComb


@dataclass
class RecVal:
    """A record value inside the circuit: its type name and per-member
    circuit values (witness-backed for record inputs)."""

    rec: str
    members: dict  # name -> CVal


@dataclass
class FunctionCircuit:
    """A compiled function: the constraint system plus the statement
    layout needed to (re)build public inputs."""

    program_id: str
    fn_name: str
    cs: R1CS
    input_tys: list   # [(vis, ty)]: vis in {'public','private','record'}
    output_tys: list  # [(kind, ty)]: kind in
    #                   {'finalize','output','private_out','record_out'}

    @property
    def n_record_outs(self) -> int:
        return sum(1 for k, _ in self.output_tys if k == "record_out")

    @property
    def has_private(self) -> bool:
        return any(v != "public" for v, _ in self.input_tys) or any(
            k in ("private_out", "record_out") for k, _ in self.output_tys)


def _bytes_to_fields(data: bytes) -> list:
    fields = [len(data)]
    for i in range(0, len(data), 31):
        fields.append(int.from_bytes(data[i:i + 31], "little"))
    return fields


def function_id(program_id: str, fn_name: str) -> int:
    """fid: Poseidon binding of the fully-qualified function name."""
    data = f"{program_id}/{fn_name}".encode()
    return poseidon.hash1(_bytes_to_fields(data), rate=2, domain=FID_DOMAIN)


def address_field(addr) -> int:
    """Statement encoding of an address: Poseidon binding of the FULL
    32-byte compressed encoding (ZERO address -> 0, the anonymous caller).

    Binding the whole encoding — not the decoded x-coordinate — means
    (a) no curve decompression is needed, so a well-formed hex string
    that is not a canonical point (e.g. a burn address) encodes without
    error on both the prove and verify sides, and (b) the sign of y is
    bound, so the on-curve twin (x, -y) cannot be substituted for the
    committed address (r4 advisory, medium)."""
    if not isinstance(addr, str):
        # a decoded edwards point (e.g. derived from an account pk)
        from snarkos_tpu.crypto.ref import edwards

        raw = edwards.compress(addr)
    else:
        if not addr.startswith("aleo1"):
            raise SynthesisUnsupported(f"malformed address {addr!r}")
        try:
            raw = bytes.fromhex(addr[5:])
        except ValueError:
            raise SynthesisUnsupported(f"malformed address {addr!r}") from None
        if len(raw) != 32:
            raise SynthesisUnsupported(f"malformed address {addr!r}")
    if raw == bytes(32):
        return 0
    return poseidon.hash1(_bytes_to_fields(raw), rate=2, domain=ADDR_DOMAIN)


def value_to_public_field(v: V.Value) -> int:
    """Canonical ONE-field encoding of a circuit-supported literal."""
    if v.ty == "field":
        return v.val % R
    if v.ty == "boolean":
        return 1 if v.val else 0
    if v.ty in UINT_BITS:
        return v.val % R
    if v.ty == "address":
        return address_field(v.val)
    raise SynthesisUnsupported(f"type {v.ty!r} has no public encoding")


def record_id(program_id: str, record_name: str) -> int:
    """rid: Poseidon binding of the record type name (a per-circuit
    constant — serials of different record types can never collide)."""
    data = f"{program_id}/{record_name}".encode()
    return poseidon.hash1(_bytes_to_fields(data), rate=2, domain=RID_DOMAIN)


def record_serial_field(program_id: str, record_name: str, v: V.Value) -> int:
    """The serial (spend tag) of a record value as a field element:
    Poseidon over [rid, member fields...] — EXACTLY the relation the
    circuit enforces on record-input wires (vm/interpreter.record_serial
    wraps this for the ledger's byte-keyed spent set)."""
    fields = [record_id(program_id, record_name)]
    for m in v.val.values():
        fields.append(value_to_public_field(m))
    return poseidon.hash1(fields, rate=2, domain=SERIAL_DOMAIN)


def derive_blinds(seed: bytes, n_rec_outs: int) -> tuple:
    """Deterministic hiding blinds from a prover-secret seed:
    (blind_in, [blind_recout_j...], blind_privout)."""
    import hashlib as _h

    def f(tag: bytes) -> int:
        return int.from_bytes(
            _h.sha256(b"snarkos_tpu.exec.blind" + tag + seed).digest(),
            "little") % R

    return (f(b"in"),
            [f(b"rec%d" % j) for j in range(n_rec_outs)],
            f(b"privout"))


# --------------------------------------------------------------------------
# the synthesizer (single walk, optional trace)
# --------------------------------------------------------------------------


class _Synth:
    def __init__(self, cs: R1CS, z: list | None):
        self.cs = cs
        self.z = z

    # -- allocation helpers --------------------------------------------------
    def alloc(self, value: int | None = None) -> int:
        idx = self.cs.alloc()
        if self.z is not None:
            self.z[idx] = (value or 0) % R
        return idx

    def val(self, lc: LinComb) -> int:
        assert self.z is not None
        return self.cs.eval_lc(lc, self.z)

    def enforce(self, a: LinComb, b: LinComb, c: LinComb):
        self.cs.enforce(a, b, c)

    def mul(self, a: LinComb, b: LinComb) -> LinComb:
        out = self.alloc(self.val(a) * self.val(b) % R if self.z is not None else None)
        self.enforce(a, b, {out: 1})
        return {out: 1}

    def bits(self, lc: LinComb, width: int) -> list:
        """Decompose lc into ``width`` boolean vars (little-endian) and
        enforce the recomposition — UNSATISFIABLE when value >= 2^width,
        which is how checked-arithmetic halts surface in the circuit."""
        v = self.val(lc) if self.z is not None else 0
        if self.z is not None and v >= (1 << width):
            raise V.HaltError(f"range check failed: {v} >= 2^{width}")
        out = []
        recomp: LinComb = {}
        for i in range(width):
            b = self.alloc((v >> i) & 1)
            self.enforce({b: 1}, _lc_add({self.cs.one: 1}, {b: R - 1}), {})
            recomp = _lc_add(recomp, {b: 1 << i})
            out.append({b: 1})
        self.enforce(_lc_add(lc, _lc_scale(recomp, R - 1)), {self.cs.one: 1}, {})
        return out

    def is_zero(self, d: LinComb) -> LinComb:
        """z = (d == 0) via the inverse trick."""
        if self.z is not None:
            dv = self.val(d)
            zv = 1 if dv == 0 else 0
            iv = 0 if dv == 0 else pow(dv, -1, R)
        else:
            zv = iv = None
        zvar = self.alloc(zv)
        ivar = self.alloc(iv)
        # d * inv = 1 - z ;  d * z = 0
        self.enforce(d, {ivar: 1}, _lc_add({self.cs.one: 1}, {zvar: R - 1}))
        self.enforce(d, {zvar: 1}, {})
        return {zvar: 1}

    def sponge_hash1(self, domain: str, fields: list) -> LinComb:
        """In-circuit Poseidon sponge over LinComb inputs, mirroring
        poseidon.hash1(fields, rate=2, domain) bit for bit (absorb into
        the two rate slots, permute per full block, squeeze slot 1)."""
        dom = poseidon._domain_to_field(domain)
        zero: LinComb = {}
        state = [{self.cs.one: dom}, zero, zero]
        pos = 0
        for lc in fields:
            if pos == 2:
                state = _poseidon_circuit(self.cs, state, self.z)
                pos = 0
            state[1 + pos] = _lc_add(state[1 + pos], dict(lc))
            pos += 1
        state = _poseidon_circuit(self.cs, state, self.z)
        return state[1]


def _int_like(ty: str) -> bool:
    return ty in UINT_BITS


def _arith_binary(s: _Synth, op: str, a: CVal, b: CVal) -> CVal:
    if a.ty != b.ty:
        raise SynthesisUnsupported(f"{op} on mixed types {a.ty}/{b.ty}")
    ty = a.ty
    if ty == "field":
        if op == "add":
            return CVal("field", _lc_add(a.lc, b.lc))
        if op == "sub":
            return CVal("field", _lc_add(a.lc, _lc_scale(b.lc, R - 1)))
        if op == "mul":
            return CVal("field", s.mul(a.lc, b.lc))
        if op == "div":
            # q with q*b = a and b invertible (div-by-zero halts)
            binv = s.alloc(pow(s.val(b.lc), -1, R) if s.z is not None
                           and s.val(b.lc) != 0 else None)
            if s.z is not None and s.val(b.lc) == 0:
                raise V.HaltError("field div by zero")
            s.enforce(b.lc, {binv: 1}, {s.cs.one: 1})
            q = s.alloc(s.val(a.lc) * pow(s.val(b.lc), -1, R) % R
                        if s.z is not None else None)
            s.enforce({q: 1}, b.lc, a.lc)
            return CVal("field", {q: 1})
        raise SynthesisUnsupported(f"field op {op!r}")
    if _int_like(ty):
        w = UINT_BITS[ty]
        if op == "add":
            out = _lc_add(a.lc, b.lc)
            s.bits(out, w)  # no-overflow range check
            return CVal(ty, out)
        if op == "sub":
            out = _lc_add(a.lc, _lc_scale(b.lc, R - 1))
            s.bits(out, w)  # underflow -> unsatisfiable
            return CVal(ty, out)
        if op == "mul":
            if w > 64:
                raise SynthesisUnsupported("u128 mul product exceeds the field")
            prod = s.mul(a.lc, b.lc)
            s.bits(prod, w)
            return CVal(ty, prod)
        raise SynthesisUnsupported(f"integer op {op!r}")
    raise SynthesisUnsupported(f"{op} on {ty}")


def _compare(s: _Synth, op: str, a: CVal, b: CVal) -> CVal:
    if a.ty != b.ty or not _int_like(a.ty):
        raise SynthesisUnsupported(f"compare on {a.ty}/{b.ty}")
    w = UINT_BITS[a.ty]
    # a - b + 2^w in [1, 2^(w+1)): bit w of the decomposition is (a >= b)
    shifted = _lc_add(_lc_add(a.lc, _lc_scale(b.lc, R - 1)),
                      {s.cs.one: 1 << w})
    bs = s.bits(shifted, w + 1)
    ge = bs[w]
    if op in ("gte", "is.gte"):
        return CVal("boolean", ge)
    if op in ("lt", "is.lt"):
        return CVal("boolean", _lc_add({s.cs.one: 1}, _lc_scale(ge, R - 1)))
    # lte(a, b) == gte(b, a); gt(a, b) == lt(b, a) — handled by caller swap
    raise SynthesisUnsupported(f"compare {op!r}")


def _ternary(s: _Synth, c: CVal, a: CVal, b: CVal) -> CVal:
    if c.ty != "boolean" or a.ty != b.ty:
        raise SynthesisUnsupported("ternary types")
    t = s.mul(c.lc, _lc_add(a.lc, _lc_scale(b.lc, R - 1)))
    return CVal(a.ty, _lc_add(t, b.lc))


def _logical(s: _Synth, op: str, a: CVal, b: CVal) -> CVal:
    if a.ty != "boolean" or b.ty != "boolean":
        raise SynthesisUnsupported(f"{op} on non-boolean")
    ab = s.mul(a.lc, b.lc)
    one: LinComb = {s.cs.one: 1}
    if op == "and":
        out = ab
    elif op == "or":
        out = _lc_add(_lc_add(a.lc, b.lc), _lc_scale(ab, R - 1))
    elif op == "xor":
        out = _lc_add(_lc_add(a.lc, b.lc), _lc_scale(ab, R - 2))
    elif op == "nand":
        out = _lc_add(one, _lc_scale(ab, R - 1))
    elif op == "nor":
        out = _lc_add(one, _lc_scale(
            _lc_add(_lc_add(a.lc, b.lc), _lc_scale(ab, R - 1)), R - 1))
    else:
        raise SynthesisUnsupported(f"logical {op!r}")
    return CVal("boolean", out)


def _hash_psd2(s: _Synth, v: CVal) -> CVal:
    """In-circuit Poseidon2 of ONE field element (interpreter parity:
    vm/interpreter._value_to_fields encodes a field value as itself)."""
    if v.ty != "field":
        raise SynthesisUnsupported("hash.psd2 provable only for field operands")
    dom = poseidon._domain_to_field(HASH_DOMAIN)
    zero: LinComb = {}
    state = [{s.cs.one: dom}, dict(v.lc), zero]
    tz = s.z  # _poseidon_circuit consumes the shared trace list directly
    out = _poseidon_circuit(s.cs, state, tz)
    return CVal("field", out[1])


def _cast(s: _Synth, v: CVal, ty: str) -> CVal:
    base = ty.split(".")[0]
    if base == v.ty:
        return v
    if base == "field" and (_int_like(v.ty) or v.ty == "boolean"):
        return CVal("field", v.lc)  # value already < 2^128 < p
    if _int_like(base) and v.ty in ("field",) | set(UINT_BITS):
        src_w = UINT_BITS.get(v.ty)
        dst_w = UINT_BITS[base]
        if src_w is not None and src_w <= dst_w:
            return CVal(base, v.lc)
        s.bits(v.lc, dst_w)  # narrowing: halt (unsat) when out of range
        return CVal(base, v.lc)
    raise SynthesisUnsupported(f"cast {v.ty} -> {ty}")


def _constrain_literal(s: _Synth, cv: CVal):
    """Type constraints on an unconstrained (witness or public) wire."""
    if cv.ty == "boolean":
        s.enforce(cv.lc, _lc_add({s.cs.one: 1}, _lc_scale(cv.lc, R - 1)), {})
    elif cv.ty in UINT_BITS:
        s.bits(cv.lc, UINT_BITS[cv.ty])


def _synthesize(program: Program, fn: Function, cs: R1CS,
                z: list | None, args: list | None, caller_f: int | None,
                blind_seed: bytes | None = None):
    """Walk the function; identical allocation order in both modes."""
    s = _Synth(cs, z)
    # -- bind statement head -------------------------------------------------
    input_tys, regs = [], {}
    slot = 1
    fid_slot = cs.public(slot); slot += 1
    caller_slot = cs.public(slot); slot += 1
    caller_cv = CVal("address", {caller_slot: 1})
    cin_slot = cs.public(slot); slot += 1
    if z is not None:
        z[fid_slot] = function_id(program.id, fn.name)
        z[caller_slot] = caller_f
    n_rec_outs = sum(1 for spec in fn.outputs
                     if spec[1].split(".")[0] in program.records
                     and not ("/" in spec[1] or spec[1].endswith(".future")))
    blinds = derive_blinds(blind_seed or b"", n_rec_outs)
    priv_fields: list = []  # LinCombs absorbed into C_in (decl order)

    # -- bind inputs (slots interleaved in declaration order) ---------------
    for i, (reg, ty, vis) in enumerate(fn.inputs):
        base = ty.split(".")[0]
        if base in program.records:
            # record input: members are WITNESS wires absorbed into C_in;
            # a PUBLIC serial slot carries the in-circuit Poseidon spend
            # tag; ownership (owner == caller) enforced in-circuit
            rec = program.records[base]
            members = {}
            arg = args[i] if z is not None else None
            for mname, mty in rec.members.items():
                mbase = mty.split(".")[0]
                if mbase not in CIRCUIT_TYPES:
                    raise SynthesisUnsupported(
                        f"record member type {mty!r}")
                mval = None
                if z is not None:
                    mv = arg.val.get(mname)
                    if mv is None:
                        raise V.HaltError(f"record missing member {mname!r}")
                    mval = value_to_public_field(mv)
                w = s.alloc(mval)
                cv = CVal(mbase, {w: 1})
                _constrain_literal(s, cv)
                members[mname] = cv
                priv_fields.append(cv.lc)
            # ownership: the record's owner must BE the (authenticated)
            # caller — reference semantics: only the owner can spend
            if z is not None and s.val(members["owner"].lc) != s.val(caller_cv.lc):
                raise V.HaltError("record is not owned by the caller")
            s.enforce(_lc_add(members["owner"].lc,
                              _lc_scale(caller_cv.lc, R - 1)),
                      {cs.one: 1}, {})
            # serial slot: Poseidon([rid, members...]) — the double-spend
            # tag is PUBLIC while the plaintext stays hidden
            serial_slot = cs.public(slot); slot += 1
            rid = record_id(program.id, base)
            ser = s.sponge_hash1(
                SERIAL_DOMAIN,
                [{cs.one: rid}] + [members[m].lc for m in rec.members])
            s.enforce(_lc_add(ser, {serial_slot: R - 1}), {cs.one: 1}, {})
            if z is not None:
                z[serial_slot] = s.val(ser)
            regs[reg] = RecVal(rec=base, members=members)
            input_tys.append(("record", base))
            continue
        if base not in CIRCUIT_TYPES:
            raise SynthesisUnsupported(f"input type {ty!r}")
        if vis == "public":
            p = cs.public(slot); slot += 1
            if z is not None:
                z[p] = value_to_public_field(args[i])
            cv = CVal(base, {p: 1})
            _constrain_literal(s, cv)
            regs[reg] = cv
            input_tys.append(("public", base))
        else:
            # private literal: witness wire, absorbed into C_in
            w = s.alloc(value_to_public_field(args[i]) if z is not None
                        else None)
            cv = CVal(base, {w: 1})
            _constrain_literal(s, cv)
            priv_fields.append(cv.lc)
            regs[reg] = cv
            input_tys.append(("private", base))

    # -- C_in: hiding commitment to every private input field --------------
    if priv_fields:
        blind_w = s.alloc(blinds[0] if z is not None else None)
        c_in = s.sponge_hash1(PRIV_DOMAIN, priv_fields + [{blind_w: 1}])
        s.enforce(_lc_add(c_in, {cin_slot: R - 1}), {cs.one: 1}, {})
        if z is not None:
            z[cin_slot] = s.val(c_in)
    else:
        s.enforce({cin_slot: 1}, {cs.one: 1}, {})  # no private inputs: 0

    def operand(tok: str) -> CVal:
        if tok in regs and isinstance(regs[tok], RecVal):
            raise SynthesisUnsupported(f"record {tok!r} used as literal")
        if tok in regs:
            return regs[tok]
        if "." in tok and tok.split(".")[0] in regs:
            base_reg, *path = tok.split(".")
            rv = regs[base_reg]
            if isinstance(rv, RecVal) and len(path) == 1 \
                    and path[0] in rv.members:
                return rv.members[path[0]]
            raise SynthesisUnsupported(f"member access {tok!r}")
        if tok in ("self.caller", "self.signer"):
            return caller_cv
        v = V.parse_literal(tok)
        if v.ty not in CIRCUIT_TYPES:
            raise SynthesisUnsupported(f"literal {tok!r}")
        return CVal(v.ty, {cs.one: value_to_public_field(v)})

    def operand_any(tok: str):
        """Operand that may be a whole record register."""
        if tok in regs and isinstance(regs[tok], RecVal):
            return regs[tok]
        return operand(tok)

    # -- instructions --------------------------------------------------------
    for ins in fn.instructions:
        op = ins.op
        if op in ("add", "sub", "mul", "div"):
            a, b = operand(ins.operands[0]), operand(ins.operands[1])
            regs[ins.dests[0]] = _arith_binary(s, op, a, b)
        elif op == "square":
            a = operand(ins.operands[0])
            regs[ins.dests[0]] = _arith_binary(s, "mul", a, a)
        elif op == "double":
            a = operand(ins.operands[0])
            regs[ins.dests[0]] = _arith_binary(s, "add", a, a)
        elif op == "neg":
            a = operand(ins.operands[0])
            if a.ty != "field":
                raise SynthesisUnsupported("neg on non-field")
            regs[ins.dests[0]] = CVal("field", _lc_scale(a.lc, R - 1))
        elif op == "inv":
            a = operand(ins.operands[0])
            one_cv = CVal("field", {cs.one: 1})
            regs[ins.dests[0]] = _arith_binary(s, "div", one_cv, a)
        elif op in ("and", "or", "xor", "nand", "nor"):
            a, b = operand(ins.operands[0]), operand(ins.operands[1])
            regs[ins.dests[0]] = _logical(s, op, a, b)
        elif op == "not":
            a = operand(ins.operands[0])
            if a.ty != "boolean":
                raise SynthesisUnsupported("not on non-boolean")
            regs[ins.dests[0]] = CVal(
                "boolean", _lc_add({cs.one: 1}, _lc_scale(a.lc, R - 1)))
        elif op == "ternary":
            c, a, b = (operand(t) for t in ins.operands)
            regs[ins.dests[0]] = _ternary(s, c, a, b)
        elif op in ("is.eq", "is.neq"):
            a, b = operand(ins.operands[0]), operand(ins.operands[1])
            d = _lc_add(a.lc, _lc_scale(b.lc, R - 1))
            zb = s.is_zero(d)
            if op == "is.neq":
                zb = _lc_add({cs.one: 1}, _lc_scale(zb, R - 1))
            regs[ins.dests[0]] = CVal("boolean", zb)
        elif op in ("assert.eq", "assert.neq"):
            a, b = operand(ins.operands[0]), operand(ins.operands[1])
            d = _lc_add(a.lc, _lc_scale(b.lc, R - 1))
            if op == "assert.eq":
                if s.z is not None and s.val(d) != 0:
                    raise V.HaltError("assert.eq failed")
                s.enforce(d, {cs.one: 1}, {})
            else:
                if s.z is not None and s.val(d) == 0:
                    raise V.HaltError("assert.neq failed")
                dinv = s.alloc(pow(s.val(d), -1, R) if s.z is not None else None)
                s.enforce(d, {dinv: 1}, {cs.one: 1})
        elif op in ("lt", "gt", "lte", "gte",
                    "is.lt", "is.gt", "is.lte", "is.gte"):
            a, b = operand(ins.operands[0]), operand(ins.operands[1])
            base = op.split(".")[-1]
            if base in ("gte", "lt"):
                regs[ins.dests[0]] = _compare(s, base, a, b)
            elif base == "lte":  # a <= b  ==  b >= a
                regs[ins.dests[0]] = _compare(s, "gte", b, a)
            else:  # gt: a > b == b < a
                regs[ins.dests[0]] = _compare(s, "lt", b, a)
        elif op in ("cast", "cast.lossy"):
            as_base = ins.as_type.split(".")[0]
            if as_base in program.records and ins.as_type.endswith(".record"):
                # record construction: members from operands (decl order)
                rec = program.records[as_base]
                if len(ins.operands) != len(rec.members):
                    raise SynthesisUnsupported("record cast arity")
                members = {}
                for (mname, mty), tok in zip(rec.members.items(),
                                             ins.operands):
                    cv = operand(tok)
                    if cv.ty != mty.split(".")[0]:
                        raise SynthesisUnsupported(
                            f"record member {mname}: {cv.ty} != {mty}")
                    members[mname] = cv
                regs[ins.dests[0]] = RecVal(rec=as_base, members=members)
                continue
            if len(ins.operands) != 1 or op.endswith("lossy"):
                raise SynthesisUnsupported("cast form")
            regs[ins.dests[0]] = _cast(s, operand(ins.operands[0]), ins.as_type)
        elif op == "hash.psd2":
            regs[ins.dests[0]] = _hash_psd2(s, operand(ins.operands[0]))
        else:
            raise SynthesisUnsupported(f"instruction {op!r}")

    # -- bind outputs --------------------------------------------------------
    output_tys, out_slots = [], []
    for tok in fn.finalize_args:
        cv = operand(tok)
        output_tys.append(("finalize", cv.ty))
        out_slots.append(cv)
    privout_fields: list = []
    rec_idx = 0
    rec_out_slots: list = []
    for out_spec in fn.outputs:
        tok, ty = out_spec[0], out_spec[1]
        vis = out_spec[2] if len(out_spec) > 2 else None
        if vis == "future" or ty.endswith(".future") or "/" in ty:
            continue  # future handle: finalize args already bound above
        base = ty.split(".")[0]
        if base in program.records:
            # record output: PUBLIC hiding commitment over the members
            rv = operand_any(tok)
            if not isinstance(rv, RecVal) or rv.rec != base:
                raise SynthesisUnsupported(f"output {tok!r} is not a {base}")
            blind_w = s.alloc(blinds[1][rec_idx] if z is not None else None)
            fields = [rv.members[m].lc for m in program.records[base].members]
            comm = s.sponge_hash1(RECOUT_DOMAIN, fields + [{blind_w: 1}])
            rec_out_slots.append(("record_out", base, comm))
            output_tys.append(("record_out", base))
            rec_idx += 1
            continue
        if base not in CIRCUIT_TYPES:
            raise SynthesisUnsupported(f"output type {ty!r}")
        cv = operand(tok)
        if vis == "private":
            privout_fields.append(cv.lc)
            output_tys.append(("private_out", cv.ty))
        else:
            output_tys.append(("output", cv.ty))
            out_slots.append(cv)
    for cv in out_slots:
        p = cs.public(slot); slot += 1
        if z is not None:
            z[p] = s.val(cv.lc)
        # (out_lc - pub_slot) * 1 = 0
        s.enforce(_lc_add(cv.lc, {p: R - 1}), {cs.one: 1}, {})
    for _kind, _base, comm in rec_out_slots:
        p = cs.public(slot); slot += 1
        if z is not None:
            z[p] = s.val(comm)
        s.enforce(_lc_add(comm, {p: R - 1}), {cs.one: 1}, {})
    # C_privout: hiding commitment over private literal outputs (0 if none)
    cpriv_slot = cs.public(slot); slot += 1
    if privout_fields:
        blind_w = s.alloc(blinds[2] if z is not None else None)
        c_priv = s.sponge_hash1(PRIVOUT_DOMAIN,
                                privout_fields + [{blind_w: 1}])
        s.enforce(_lc_add(c_priv, {cpriv_slot: R - 1}), {cs.one: 1}, {})
        if z is not None:
            z[cpriv_slot] = s.val(c_priv)
    else:
        s.enforce({cpriv_slot: 1}, {cs.one: 1}, {})
    return input_tys, output_tys, slot


def _synth_sized(program: Program, fn: Function, num_public: int, n: int,
                 z_fill: tuple | None):
    cs = R1CS(num_public=num_public, n=n)
    if z_fill is None:
        tys = _synthesize(program, fn, cs, None, None, None)
        return cs, tys
    args, caller_f, blind_seed = z_fill
    z = [0] * n
    z[cs.one] = 1
    tys = _synthesize(program, fn, cs, z, args, caller_f, blind_seed)
    return cs, tys, z


def _layout(program: Program, fn: Function):
    """First pass at a generous size to learn the dimensions."""
    for probe_log in (14, 16, 18):
        probe = R1CS(num_public=256, n=1 << probe_log)
        try:
            in_tys, out_tys, slots = _synthesize(program, fn, probe,
                                                 None, None, None)
            break
        except (IndexError, AssertionError):
            if probe_log == 18:
                raise SynthesisUnsupported("function too large to probe")
    num_public = 1
    while num_public < slots:
        num_public *= 2
    need = max(probe.num_constraints + 1, probe._next_aux + num_public + 1,
               2 * num_public)
    n = 1 << max(need - 1, 1).bit_length()
    n = max(n, 2 * num_public, 16)
    return in_tys, out_tys, num_public, n


@functools.lru_cache(maxsize=64)
def _compile_cached(program_key: str, fn_name: str):
    program = _PROGRAMS[program_key]
    fn = program.functions[fn_name]
    in_tys, out_tys, num_public, n = _layout(program, fn)
    cs, _ = _synth_sized(program, fn, num_public, n, None)
    return FunctionCircuit(program_id=program.id, fn_name=fn_name, cs=cs,
                           input_tys=in_tys, output_tys=out_tys)


# content-hash -> Program, bounded: keyed by source digest so re-parses of
# the same deploy (deployment_vk_check parses fresh objects per gossip)
# dedupe, and adversarial deploy spam cannot grow it without bound
# (r4 advisory, medium). Sized above the lru_cache so live cache entries
# always find their program; FIFO eviction of the oldest beyond that.
_PROGRAMS: dict = {}
_PROGRAMS_MAX = 256


def compile_function(program: Program, fn_name: str) -> FunctionCircuit:
    """Compile (and cache) the circuit for ``program.fn_name``.
    Raises SynthesisUnsupported outside the provable subset."""
    import hashlib as _hashlib

    key = _hashlib.sha256(program.source.encode()).hexdigest()
    if key not in _PROGRAMS:
        while len(_PROGRAMS) >= _PROGRAMS_MAX:
            _PROGRAMS.pop(next(iter(_PROGRAMS)))
        _PROGRAMS[key] = program
    return _compile_cached(key, fn_name)


def trace_execution(program: Program, fn_name: str, args: list,
                    caller_field: int, blind_seed: bytes = b""):
    """Concrete witness for a compiled function. args: list[V.Value]
    (record inputs as record Values). ``blind_seed`` derives the hiding
    blinds of the private-input/record-output commitments. Returns
    (circuit, z, publics). Raises HaltError on a faulting trace (which
    is also unprovable) and SynthesisUnsupported as compile."""
    circ = compile_function(program, fn_name)
    fn = program.functions[fn_name]
    cs2, _tys, z = _synth_sized(program, fn, circ.cs.num_public, circ.cs.n,
                                (args, caller_field, blind_seed))
    publics = [z[cs2.public(i)] for i in range(cs2.num_public)]
    return circ, z, publics


def vk_digest(circuit: FunctionCircuit, srs) -> bytes:
    """Deployment verifying-key digest: sha256 over the Varuna index
    commitments (the 9 matrix-polynomial commitments that ARE the
    verifying key) plus the domain sizes.  Reference deployments carry
    per-function verifying keys certified at admission (snarkVM
    check_deployment, reached via ledger.rs:319-341)."""
    import hashlib as _hashlib

    from snarkos_tpu.crypto.ref import g1 as _g1
    from snarkos_tpu.crypto.ref import varuna as _varuna

    index = _varuna.get_index(srs, circuit.cs)
    h = _hashlib.sha256()
    h.update(f"{circuit.program_id}/{circuit.fn_name}".encode())
    h.update(index.n.to_bytes(8, "little") + index.k_size.to_bytes(8, "little"))
    for c in index.commitments:
        a = _g1.affine(c)
        if a is None:
            h.update(bytes(97))
        else:
            h.update(a[0].to_bytes(48, "little") + a[1].to_bytes(48, "little") + b"\x00")
    return h.digest()


def statement_parts(circuit: FunctionCircuit, publics: list) -> dict:
    """Split a traced statement vector into its named components (the
    inverse of build_publics' layout)."""
    pos = 1
    fid = publics[pos]; pos += 1
    caller = publics[pos]; pos += 1
    c_in = publics[pos]; pos += 1
    serials, pub_inputs = [], []
    for vis, _ty in circuit.input_tys:
        if vis == "record":
            serials.append(publics[pos]); pos += 1
        elif vis == "public":
            pub_inputs.append(publics[pos]); pos += 1
    n_out = sum(1 for k, _ in circuit.output_tys if k in ("finalize", "output"))
    outs = publics[pos:pos + n_out]; pos += n_out
    rec_comms = publics[pos:pos + circuit.n_record_outs]
    pos += circuit.n_record_outs
    c_privout = publics[pos]; pos += 1
    return {"fid": fid, "caller": caller, "c_in": c_in, "serials": serials,
            "public_inputs": pub_inputs, "outputs": outs,
            "rec_comms": rec_comms, "c_privout": c_privout}


def build_publics(circuit: FunctionCircuit, caller_field: int,
                  input_fields: list, output_fields: list,
                  c_in: int = 0, serials: list | None = None,
                  rec_out_comms: list | None = None,
                  c_privout: int = 0) -> list | None:
    """Verifier-side statement vector from payload-derived values; None
    when any arity disagrees with the circuit.

    ``input_fields``: the PUBLIC input literal fields in declaration
    order; ``serials``: one per record input, in declaration order (the
    two interleave into slots per input_tys); ``output_fields``: finalize
    args followed by PUBLIC output literal fields; ``rec_out_comms``:
    one commitment per record output; ``c_in``/``c_privout``: the
    private-input / private-output commitments (0 when absent)."""
    serials = serials or []
    rec_out_comms = rec_out_comms or []
    n_pub_in = sum(1 for v, _ in circuit.input_tys if v == "public")
    n_rec_in = sum(1 for v, _ in circuit.input_tys if v == "record")
    n_out = sum(1 for k, _ in circuit.output_tys if k in ("finalize", "output"))
    n_rec_out = circuit.n_record_outs
    if (len(input_fields) != n_pub_in or len(serials) != n_rec_in
            or len(output_fields) != n_out
            or len(rec_out_comms) != n_rec_out):
        return None
    slots = [1, function_id(circuit.program_id, circuit.fn_name),
             caller_field % R, c_in % R]
    it_pub, it_ser = iter(input_fields), iter(serials)
    for vis, _ty in circuit.input_tys:
        if vis == "record":
            slots.append(next(it_ser) % R)
        elif vis == "public":
            slots.append(next(it_pub) % R)
    slots += [v % R for v in output_fields]
    slots += [v % R for v in rec_out_comms]
    slots.append(c_privout % R)
    if len(slots) > circuit.cs.num_public:
        return None
    slots += [0] * (circuit.cs.num_public - len(slots))
    return slots
