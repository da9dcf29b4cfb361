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
    [1] fid      Poseidon binding of "<program>/<function>"
    [2] caller   address x-coordinate (ZERO for anonymous calls)
    [3 ..]       input literals, then output literals (finalize args
                 followed by literal outputs), zero-padded

The verifier rebuilds this vector natively from the transaction payload
and the claimed outputs, so a proof binds (program, function, caller,
inputs) -> outputs with NO re-execution of the function body.  Checked
integer semantics map to range constraints: an overflowing trace has no
satisfying assignment, so a HaltError execution is unprovable — the
circuit enforces the interpreter's halt semantics rather than modelling
them.

Functions using constructs outside the supported subset (records,
structs, group/scalar ops, signed ints, non-field hashes, closures)
raise ``SynthesisUnsupported``; such functions remain enforced by public
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
class FunctionCircuit:
    """A compiled function: the constraint system plus the statement
    layout needed to (re)build public inputs."""

    program_id: str
    fn_name: str
    cs: R1CS
    input_tys: list  # declared input types (literal names)
    output_tys: list  # [(kind, ty)]: kind in {'finalize', 'output'}


def function_id(program_id: str, fn_name: str) -> int:
    """fid: Poseidon binding of the fully-qualified function name."""
    data = f"{program_id}/{fn_name}".encode()
    fields = [len(data)]
    for i in range(0, len(data), 31):
        fields.append(int.from_bytes(data[i:i + 31], "little"))
    return poseidon.hash1(fields, rate=2, domain=FID_DOMAIN)


def value_to_public_field(v: V.Value) -> int:
    """Canonical ONE-field encoding of a circuit-supported literal."""
    if v.ty == "field":
        return v.val % R
    if v.ty == "boolean":
        return 1 if v.val else 0
    if v.ty in UINT_BITS:
        return v.val % R
    if v.ty == "address":
        # x-coordinate of the decoded point (ZERO address -> 0); matches
        # node/ledger._address_field on the verifier side
        addr = v.val if isinstance(v.val, str) else None
        if addr is None:
            return v.val[0] % R
        if set(addr[5:]) <= {"0"}:
            return 0
        from snarkos_tpu.crypto.ref import edwards

        return edwards.decompress(bytes.fromhex(addr[5:]))[0] % R
    raise SynthesisUnsupported(f"type {v.ty!r} has no public encoding")


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


def _synthesize(program: Program, fn: Function, cs: R1CS,
                z: list | None, args: list | None, caller_f: int | None):
    """Walk the function; identical allocation order in both modes."""
    s = _Synth(cs, z)
    # -- bind publics --------------------------------------------------------
    input_tys, regs = [], {}
    slot = 1
    fid_slot = cs.public(slot); slot += 1
    caller_slot = cs.public(slot); slot += 1
    caller_cv = CVal("address", {caller_slot: 1})
    if z is not None:
        z[fid_slot] = function_id(program.id, fn.name)
        z[caller_slot] = caller_f
    for i, (reg, ty, _vis) in enumerate(fn.inputs):
        base = ty.split(".")[0]
        if base not in CIRCUIT_TYPES:
            raise SynthesisUnsupported(f"input type {ty!r}")
        p = cs.public(slot); slot += 1
        if z is not None:
            z[p] = value_to_public_field(args[i])
        cv = CVal(base, {p: 1})
        if base == "boolean":
            s.enforce(cv.lc, _lc_add({cs.one: 1}, _lc_scale(cv.lc, R - 1)), {})
        elif base in UINT_BITS:
            s.bits(cv.lc, UINT_BITS[base])
        regs[reg] = cv
        input_tys.append(base)

    def operand(tok: str) -> CVal:
        if tok in regs:
            return regs[tok]
        if "." in tok and tok.split(".")[0] in regs:
            raise SynthesisUnsupported(f"member access {tok!r}")
        if tok in ("self.caller", "self.signer"):
            return caller_cv
        v = V.parse_literal(tok)
        if v.ty not in CIRCUIT_TYPES:
            raise SynthesisUnsupported(f"literal {tok!r}")
        return CVal(v.ty, {cs.one: value_to_public_field(v)})

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
    for (tok, ty) in fn.outputs:
        if ty.endswith(".future") or "/" in ty:
            continue  # future handle: finalize args already bound above
        base = ty.split(".")[0]
        if base not in CIRCUIT_TYPES:
            raise SynthesisUnsupported(f"output type {ty!r}")
        cv = operand(tok)
        output_tys.append(("output", cv.ty))
        out_slots.append(cv)
    for cv in out_slots:
        p = cs.public(slot); slot += 1
        if z is not None:
            z[p] = s.val(cv.lc)
        # (out_lc - pub_slot) * 1 = 0
        s.enforce(_lc_add(cv.lc, {p: R - 1}), {cs.one: 1}, {})
    return input_tys, output_tys, slot


def _synth_sized(program: Program, fn: Function, num_public: int, n: int,
                 z_fill: tuple | None):
    cs = R1CS(num_public=num_public, n=n)
    if z_fill is None:
        tys = _synthesize(program, fn, cs, None, None, None)
        return cs, tys
    args, caller_f = z_fill
    z = [0] * n
    z[cs.one] = 1
    tys = _synthesize(program, fn, cs, z, args, caller_f)
    return cs, tys, z


def _layout(program: Program, fn: Function):
    """First pass at a generous size to learn the dimensions."""
    probe = R1CS(num_public=256, n=1 << 14)
    in_tys, out_tys, slots = _synthesize(program, fn, probe, None, None, None)
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


_PROGRAMS: dict = {}


def compile_function(program: Program, fn_name: str) -> FunctionCircuit:
    """Compile (and cache) the circuit for ``program.fn_name``.
    Raises SynthesisUnsupported outside the provable subset."""
    key = f"{program.id}:{id(program)}"
    _PROGRAMS[key] = program
    return _compile_cached(key, fn_name)


def trace_execution(program: Program, fn_name: str, args: list,
                    caller_field: int):
    """Concrete witness for a compiled function. args: list[V.Value].
    Returns (circuit, z, publics). Raises HaltError on a faulting trace
    (which is also unprovable) and SynthesisUnsupported as compile."""
    circ = compile_function(program, fn_name)
    fn = program.functions[fn_name]
    cs2, _tys, z = _synth_sized(program, fn, circ.cs.num_public, circ.cs.n,
                                (args, caller_field))
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


def build_publics(circuit: FunctionCircuit, caller_field: int,
                  input_fields: list, output_fields: list) -> list | None:
    """Verifier-side statement vector from payload-derived values; None
    when the arity disagrees with the circuit."""
    if len(input_fields) != len(circuit.input_tys):
        return None
    if len(output_fields) != len(circuit.output_tys):
        return None
    slots = [1, function_id(circuit.program_id, circuit.fn_name),
             caller_field % R]
    slots += [v % R for v in input_fields]
    slots += [v % R for v in output_fields]
    if len(slots) > circuit.cs.num_public:
        return None
    slots += [0] * (circuit.cs.num_public - len(slots))
    return slots
