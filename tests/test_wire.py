"""Codec round-trip tests for every Message and Event variant (mirrors the
reference's proptest strategy, SURVEY.md §4 item 9)."""

import random

import pytest

from snarkos_tpu.crypto.ref import edwards
from snarkos_tpu.node import events, messages, types
from snarkos_tpu.node.codec import Reader, Writer

RNG = random.Random(2024)


def _rand_bytes(n):
    return bytes(RNG.randrange(256) for _ in range(n))


ACCT = edwards.Account.new(seed=b"\x11" * 32)
ADDR = "aleo1" + edwards.compress(ACCT.pk).hex()


def _rand_tid():
    return types.TransmissionID(RNG.choice([0, 1]), _rand_bytes(32))


def _rand_solution():
    return types.Solution(
        epoch_hash=_rand_bytes(32), address=ADDR, nonce=RNG.getrandbits(64),
        commitment=_rand_bytes(97), eval_y=RNG.getrandbits(250), witness=_rand_bytes(97),
    )


def _rand_transaction():
    return types.Transaction(
        payload=_rand_bytes(RNG.randrange(0, 64)), fee=RNG.getrandbits(32),
        auth_tag=RNG.getrandbits(250), proof=_rand_bytes(7 * 97 + 7 * 32 + 97),
        is_deploy=RNG.random() < 0.5,
    )


def _rand_header():
    return types.BatchHeader.sign_new(
        ACCT, round_=RNG.randrange(1000), timestamp=RNG.randrange(1 << 40),
        committee_id=_rand_bytes(32),
        transmission_ids=[_rand_tid() for _ in range(3)],
        previous_certificate_ids=[_rand_bytes(32) for _ in range(2)],
    )


def _rand_certificate():
    hdr = _rand_header()
    sigs = tuple(
        (ADDR, edwards.sign_bytes(ACCT.sk, ACCT.pk, hdr.batch_id)) for _ in range(2)
    )
    return types.BatchCertificate(batch_header=hdr, signatures=sigs)


def _rand_block():
    sub = types.Subdag(rounds=((2, (_rand_certificate(),)),))
    return types.Block(
        height=RNG.randrange(1 << 30), previous_hash=_rand_bytes(32),
        timestamp=RNG.randrange(1 << 40), round=4, epoch_hash=_rand_bytes(32),
        proof_target=256, subdag=sub,
        transmissions=(types.Transmission.from_solution(_rand_solution()),),
    )


def _rand_locators():
    recents = tuple((h, _rand_bytes(32)) for h in range(40, 60))
    checkpoints = ((0, _rand_bytes(32)),)
    return messages.BlockLocators(recents, checkpoints)


class TestTypesRoundtrip:
    def test_transmission_types(self):
        for obj in [_rand_solution(), _rand_transaction()]:
            t = (types.Transmission.from_solution(obj) if isinstance(obj, types.Solution)
                 else types.Transmission.from_transaction(obj))
            r = Reader(t.to_bytes())
            back = types.Transmission.from_reader(r)
            r.expect_done()
            assert back == t and back.deserialize() == obj

    def test_batch_header_roundtrip_and_signature(self):
        hdr = _rand_header()
        r = Reader(hdr.to_bytes())
        back = types.BatchHeader.from_reader(r)
        r.expect_done()
        assert back == hdr
        assert back.verify_signature()
        tampered = types.BatchHeader(**{**back.__dict__, "round": back.round + 1})
        assert not tampered.verify_signature()

    def test_certificate_verify(self):
        committee = types.Committee.new(1, {ADDR: 100})
        cert = _rand_certificate()
        assert types.BatchCertificate.from_bytes(cert.to_bytes()) == cert
        assert cert.verify(committee)

    def test_block_roundtrip(self):
        b = _rand_block()
        assert types.Block.from_bytes(b.to_bytes()) == b
        assert len(b.hash) == 32

    def test_committee_thresholds(self):
        c = types.Committee.new(1, {f"v{i}": 100 for i in range(4)})
        assert c.total_stake == 400
        assert c.quorum_threshold() == 267
        assert c.availability_threshold() == 134
        assert c.is_quorum(["v0", "v1", "v2"])
        assert not c.is_quorum(["v0", "v1"])
        assert c.is_availability(["v0", "v1"])
        assert not c.is_availability(["v0"])
        leader = c.get_leader(10)
        assert leader in c.addresses
        assert c.get_leader(10) == leader  # deterministic


MESSAGE_SAMPLES = [
    messages.BlockRequest(5, 10),
    messages.ChallengeRequest(1, 4130, messages.NodeType.VALIDATOR, ADDR, 42),
    messages.ChallengeResponse(_rand_bytes(32), _rand_bytes(32), (3, 4), 7),
    messages.Disconnect(messages.DisconnectReason.PROTOCOL_VIOLATION),
    messages.PeerRequest(),
    messages.PeerResponse((("127.0.0.1", 4130), ("10.0.0.2", 4131))),
    messages.Ping(1, messages.NodeType.CLIENT, _rand_locators()),
    messages.Ping(1, messages.NodeType.PROVER, None),
    messages.Pong(True),
    messages.Pong(None),
    messages.PuzzleRequest(),
    messages.PuzzleResponse(_rand_bytes(32), 100, 512),
    messages.UnconfirmedSolution(_rand_tid(), _rand_solution().to_bytes()),
    messages.UnconfirmedTransaction(_rand_tid(), _rand_transaction().to_bytes()),
]


@pytest.mark.parametrize("msg", MESSAGE_SAMPLES, ids=lambda m: type(m).__name__)
def test_message_roundtrip(msg):
    assert messages.deserialize(messages.serialize(msg)) == msg


def test_block_response_roundtrip():
    msg = messages.BlockResponse(messages.BlockRequest(0, 1), (_rand_block(),))
    assert messages.deserialize(messages.serialize(msg)) == msg


def test_block_response_cap():
    blocks = tuple(_rand_block() for _ in range(6))
    msg = messages.BlockResponse(messages.BlockRequest(0, 6), blocks)
    with pytest.raises(ValueError):
        messages.deserialize(messages.serialize(msg))


EVENT_SAMPLES = [
    events.BatchPropose(3, _rand_header().to_bytes()),
    events.BatchSignature(_rand_bytes(32), (5, 6)),
    events.BatchCertified(_rand_certificate().to_bytes()),
    events.BlockRequest(1, 3),
    events.CertificateRequest(_rand_bytes(32)),
    events.CertificateResponse(_rand_bytes(32), _rand_certificate().to_bytes()),
    events.CertificateResponse(_rand_bytes(32), None),
    events.GatewayChallengeRequest(1, 5000, ADDR, 9),
    events.GatewayChallengeResponse((1, 2), 8),
    events.PrimaryPing(1, 50, None),
    events.PrimaryPing(1, 50, _rand_certificate().to_bytes()),
    events.TransmissionRequest(_rand_tid()),
    events.TransmissionResponse(_rand_tid(), None),
    events.TransmissionResponse(
        _rand_tid(), types.Transmission.from_solution(_rand_solution()).to_bytes()
    ),
    events.ValidatorsRequest(),
    events.ValidatorsResponse((("127.0.0.1", 5000, ADDR),)),
    events.WorkerPing((_rand_tid(), _rand_tid())),
]


@pytest.mark.parametrize("ev", EVENT_SAMPLES, ids=lambda e: type(e).__name__)
def test_event_roundtrip(ev):
    assert events.deserialize(events.serialize(ev)) == ev


def test_malformed_rejected():
    with pytest.raises(Exception):
        messages.deserialize(b"\xff\xff\x00")
    with pytest.raises(Exception):
        events.deserialize(b"")
    # trailing garbage
    good = messages.serialize(messages.PeerRequest())
    with pytest.raises(Exception):
        messages.deserialize(good + b"\x00")


def test_block_response_well_formedness():
    """DataBlocks response checks (events/src/block_response.rs:69-91)."""
    import dataclasses

    b1 = _rand_block()
    b2 = dataclasses.replace(b1, height=b1.height + 1)
    b_gap = dataclasses.replace(b1, height=b1.height + 5)
    # empty
    with pytest.raises(ValueError):
        messages.BlockResponse(messages.BlockRequest(0, 1), ()).ensure_well_formed()
    # non-sequential
    resp = messages.BlockResponse(
        messages.BlockRequest(b1.height, b_gap.height + 1), (b1, b_gap))
    with pytest.raises(ValueError):
        resp.ensure_well_formed()
    # range mismatch
    resp = messages.BlockResponse(messages.BlockRequest(0, 99), (b1,))
    with pytest.raises(ValueError):
        resp.ensure_well_formed()
    # well-formed passes
    messages.BlockResponse(
        messages.BlockRequest(b1.height, b2.height + 1), (b1, b2)
    ).ensure_well_formed()


@pytest.mark.parametrize("sample", range(40))
def test_message_roundtrip_randomized(sample):
    """Proptest-style: fresh random instances per variant, many samples."""
    builders = [
        lambda: messages.Ping(messages.VERSION, RNG.choice([0, 1, 2]), None),
        lambda: messages.Pong(RNG.random() < 0.5),
        lambda: messages.BlockRequest(RNG.randrange(1 << 32), RNG.randrange(1 << 32)),
        lambda: messages.PeerResponse(
            tuple(("10.0.0.%d" % RNG.randrange(255), RNG.randrange(1 << 16))
                  for _ in range(RNG.randrange(5)))),
        lambda: messages.UnconfirmedSolution(_rand_tid(), _rand_bytes(RNG.randrange(200))),
        lambda: messages.UnconfirmedTransaction(_rand_tid(), _rand_bytes(RNG.randrange(200))),
        lambda: messages.Disconnect(RNG.randrange(12)),
        lambda: messages.PuzzleResponse(_rand_bytes(32), RNG.randrange(1 << 32),
                                        RNG.getrandbits(64)),
    ]
    m = RNG.choice(builders)()
    assert messages.deserialize(messages.serialize(m)) == m


@pytest.mark.parametrize("trial", range(60))
def test_codec_fuzz_no_crash(trial):
    """Byte-flip fuzzing: a mutated frame must either decode to SOME valid
    message or raise a clean ValueError/KeyError/struct error — never
    hang, never raise uncontrolled internals past deserialize()."""
    rng = random.Random(9000 + trial)
    base = bytearray(messages.serialize(random.Random(7).choice([
        messages.Ping(messages.VERSION, 1, None),
        messages.BlockRequest(3, 8),
        messages.PeerRequest(),
        messages.PuzzleRequest(),
    ])))
    for _ in range(rng.randrange(1, 4)):
        base[rng.randrange(len(base))] ^= 1 << rng.randrange(8)
    try:
        messages.deserialize(bytes(base))
    except Exception:
        pass  # clean rejection is fine; crashes/hangs are not


@pytest.mark.parametrize("trial", range(60))
def test_event_codec_fuzz_no_crash(trial):
    rng = random.Random(31000 + trial)
    base = bytearray(events.serialize(random.Random(3).choice([
        events.BlockRequest(1, 3),
        events.CertificateRequest(bytes(32)),
        events.ValidatorsRequest(),
        events.TransmissionRequest(types.TransmissionID(0, bytes(32))),
    ])))
    for _ in range(rng.randrange(1, 4)):
        base[rng.randrange(len(base))] ^= 1 << rng.randrange(8)
    try:
        events.deserialize(bytes(base))
    except Exception:
        pass
