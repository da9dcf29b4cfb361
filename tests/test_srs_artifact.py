"""Production SRS loading (r4 verdict #6): artifact format, digest
pinning, pairing-consistency validation, dev-path quarantine."""

import hashlib

import pytest

from snarkos_tpu.crypto import params, srs_artifact
from snarkos_tpu.crypto.ref import g1, kzg

R = params.FR_MODULUS


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    # a "ceremony" SRS with a tau this test immediately forgets
    srs = kzg.SRS.setup(24, tau=pow(params.FR_GENERATOR, 987654321, R))
    path = str(tmp_path_factory.mktemp("srs") / "ceremony.srs")
    digest = srs_artifact.save_srs(path, srs)
    return path, digest, srs


class TestArtifactRoundtrip:
    def test_load_validates_and_roundtrips(self, artifact):
        path, digest, srs = artifact
        loaded = srs_artifact.load_srs(path, digest)
        assert len(loaded.powers_g1) == len(srs.powers_g1)
        for a, b in zip(loaded.powers_g1, srs.powers_g1):
            assert g1.affine(a) == g1.affine(b)
        assert loaded.h == srs.h and loaded.tau_h == srs.tau_h

    def test_digest_mismatch_rejected(self, artifact):
        path, _, _ = artifact
        with pytest.raises(srs_artifact.SRSArtifactError, match="digest"):
            srs_artifact.load_srs(path, "00" * 32)

    def test_bad_magic_rejected(self, tmp_path):
        p = tmp_path / "junk.srs"
        p.write_bytes(b"NOT_AN_SRS_FILE!" + b"\x00" * 64)
        with pytest.raises(srs_artifact.SRSArtifactError, match="magic"):
            srs_artifact.load_srs(str(p))

    def test_tampered_power_fails_consistency(self, artifact, tmp_path):
        path, _, srs = artifact
        # replace power 3 with ANOTHER valid curve point: on-curve checks
        # pass, only the pairing consistency check can catch it
        import dataclasses

        evil = dataclasses.replace(
            srs, powers_g1=list(srs.powers_g1))
        evil.powers_g1[3] = g1.scalar_mul(12345, g1.GENERATOR)
        p = str(tmp_path / "evil.srs")
        srs_artifact.save_srs(p, evil)
        with pytest.raises(srs_artifact.SRSArtifactError, match="consistency"):
            srs_artifact.load_srs(p)

    def test_tampered_tau_h_fails_consistency(self, artifact, tmp_path):
        path, _, srs = artifact
        import dataclasses

        from snarkos_tpu.crypto.ref import pairing

        evil = dataclasses.replace(
            srs, tau_h=pairing.g2_scalar_mul(777, pairing.G2_GENERATOR))
        p = str(tmp_path / "evil2.srs")
        srs_artifact.save_srs(p, evil)
        with pytest.raises(srs_artifact.SRSArtifactError, match="consistency"):
            srs_artifact.load_srs(p)

    def test_off_curve_point_rejected(self, artifact, tmp_path):
        path, _, _ = artifact
        raw = bytearray(open(path, "rb").read())
        # corrupt power 1's x-coordinate
        raw[24 + 96] ^= 1
        p = tmp_path / "offcurve.srs"
        p.write_bytes(bytes(raw))
        with pytest.raises(srs_artifact.SRSArtifactError,
                           match="curve|generator"):
            srs_artifact.load_srs(str(p))

    def test_wrong_first_power_rejected(self, artifact, tmp_path):
        path, _, srs = artifact
        import dataclasses

        evil = dataclasses.replace(srs, powers_g1=list(srs.powers_g1))
        evil.powers_g1[0] = g1.scalar_mul(2, g1.GENERATOR)
        p = str(tmp_path / "gen.srs")
        srs_artifact.save_srs(p, evil)
        with pytest.raises(srs_artifact.SRSArtifactError, match="generator"):
            srs_artifact.load_srs(p)


class TestKZGOnArtifact:
    def test_commit_open_verify_on_loaded_srs(self, artifact):
        path, digest, _ = artifact
        srs = srs_artifact.load_srs(path, digest)
        coeffs = [(7 * i + 3) % R for i in range(9)]
        c = kzg.commit(srs, coeffs)
        z = 0xABCDEF
        y, w = kzg.open_at(srs, coeffs, z)
        assert kzg.verify(srs, c, z, y, w)
        assert not kzg.verify(srs, c, z, (y + 1) % R, w)


class TestDevQuarantine:
    def test_cli_refuses_nondev_without_srs(self, capsys):
        from snarkos_tpu.node import cli

        # start with no --dev and no --srs must exit(1) before any node
        # construction
        argv = ["start", "--validator", "--private-key-seed", "x",
                "--norest"]
        with pytest.raises(SystemExit) as ei:
            cli.main(argv)
        assert ei.value.code == 1
        assert "--srs" in capsys.readouterr().err

    def test_puzzle_artifact_mode_flags_not_dev(self, artifact, monkeypatch):
        from snarkos_tpu.ops import puzzle as pz_mod

        path, digest, _ = artifact
        monkeypatch.setenv("SNARKOS_TPU_SRS_PATH", path)
        monkeypatch.setenv("SNARKOS_TPU_SRS_DIGEST", digest)
        pz = pz_mod.Puzzle(log_degree=4)  # needs 17 powers <= 25 available
        assert pz.srs.is_dev is False
        assert len(pz.srs.srs_ref.powers_g1) == 25  # FULL artifact retained

    def test_artifact_too_small_for_puzzle(self, artifact, monkeypatch):
        from snarkos_tpu.ops import puzzle as pz_mod

        path, digest, _ = artifact
        monkeypatch.setenv("SNARKOS_TPU_SRS_PATH", path)
        monkeypatch.setenv("SNARKOS_TPU_SRS_DIGEST", digest)
        with pytest.raises(srs_artifact.SRSArtifactError, match="powers"):
            pz_mod.Puzzle(log_degree=8)
