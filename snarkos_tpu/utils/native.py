"""ctypes bindings for the C++ host accelerators (native/host_accel.cpp).

Builds the shared library on first use if g++ is available; every entry
point has a pure-Python fallback so the framework works without the
native layer (it is a performance path, not a correctness dependency).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhostaccel.so")
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ha_sha256d.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_char_p]
        lib.ha_sha256d_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_char_p
        ]
        lib.ha_assign_to_worker.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint8,
            ctypes.c_char_p,
        ]
        lib.ha_limbs_to_bytes.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_char_p,
        ]
        lib.ha_bytes_to_limbs.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
        log.debug("native host accelerators loaded")
    except Exception as exc:
        log.debug("native host accelerators unavailable (%s); using Python", exc)
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def sha256d(data: bytes) -> bytes:
    # hashlib routes to OpenSSL's assembler SHA-256, which outstrips any
    # portable C++ here (measured 260x); the C++ ha_sha256d stays as a
    # reference/fallback for hosts without OpenSSL.
    return hashlib.sha256(hashlib.sha256(data).digest()).digest()


def sha256d_batch(items: list[bytes]) -> list[bytes]:
    """Batch sha256d for transmission-ID hashing (OpenSSL-backed)."""
    h = hashlib.sha256
    return [h(h(i).digest()).digest() for i in items]


def assign_to_worker(ids: list[bytes], num_workers: int) -> list[int]:
    """Double-sha256-based worker partition (helpers/partition.rs:40-67)."""
    return [d[0] % num_workers for d in sha256d_batch(ids)]


def limbs_to_bytes(limbs: np.ndarray) -> bytes:
    """(L, B) int32 16-bit limbs -> B packed 2L-byte LE strings."""
    limbs = np.ascontiguousarray(limbs, dtype=np.int32)
    L, B = limbs.shape
    lib = _load()
    if lib is None:
        return limbs.T.astype("<u2").tobytes()
    out = ctypes.create_string_buffer(2 * L * B)
    lib.ha_limbs_to_bytes(
        limbs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), L, B, out
    )
    return out.raw


def bytes_to_limbs(data: bytes, nlimbs: int) -> np.ndarray:
    """Packed LE byte strings -> (L, B) int32 limb array."""
    B = len(data) // (2 * nlimbs)
    lib = _load()
    if lib is None:
        arr = np.frombuffer(data, dtype="<u2").reshape(B, nlimbs)
        return arr.T.astype(np.int32)
    out = np.empty((nlimbs, B), dtype=np.int32)
    lib.ha_bytes_to_limbs(
        data, nlimbs, B, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    )
    return out


# -- native BLS12-377 G1 engine (native/g1_msm.cpp) -------------------------

_G1_LIB_PATH = os.path.join(_NATIVE_DIR, "libg1msm.so")
_G1_LIB = None
_G1_TRIED = False


def _load_g1():
    global _G1_LIB, _G1_TRIED
    if _G1_TRIED:
        return _G1_LIB
    _G1_TRIED = True
    try:
        if not os.path.exists(_G1_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR, "libg1msm.so"],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_G1_LIB_PATH)
        lib.g1_msm.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                               ctypes.c_long, ctypes.c_char_p]
        lib.g1_msm.restype = ctypes.c_int
        if hasattr(lib, "g1_msm_mt"):
            lib.g1_msm_mt.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                      ctypes.c_long, ctypes.c_int,
                                      ctypes.c_char_p]
            lib.g1_msm_mt.restype = ctypes.c_int
        lib.g1_fixed_base_gen.argtypes = [ctypes.c_uint64, ctypes.c_long,
                                          ctypes.c_void_p]
        lib.g1_fixed_base_gen.restype = ctypes.c_int
        _G1_LIB = lib
    except Exception as exc:  # pragma: no cover
        log.debug("native g1 engine unavailable: %s", exc)
        _G1_LIB = None
    return _G1_LIB


def have_g1() -> bool:
    return _load_g1() is not None


def g1_fixed_base_gen(seed: int, n: int):
    """n pseudo-random curve points k_i * G (64-bit splitmix64 k_i, odd):
    SRS-like structure-free bases for MSM benches/tests. Returns an
    (n, 12) uint64 array of canonical little-endian affine x||y limbs
    (6 + 6 per point), or None if the engine is missing."""
    lib = _load_g1()
    if lib is None:
        return None
    out = np.empty((n, 12), dtype=np.uint64)
    if lib.g1_fixed_base_gen(seed, n, out.ctypes.data) != 0:
        return None
    return out


def g1_msm(scalars: list, affine_points: list):
    """Native windowed-Pippenger MSM. scalars: canonical Fr ints;
    affine_points: (x, y) canonical Fq int pairs. Returns a Jacobian
    (X, Y, Z) tuple of canonical ints, or None if the engine is missing."""
    lib = _load_g1()
    if lib is None:
        return None
    n = len(scalars)
    sbuf = b"".join(int(k).to_bytes(32, "little") for k in scalars)
    pbuf = b"".join(int(x).to_bytes(48, "little") + int(y).to_bytes(48, "little")
                    for x, y in affine_points)
    out = ctypes.create_string_buffer(144)
    if lib.g1_msm(sbuf, pbuf, n, out) != 0:
        return None
    raw = out.raw
    return tuple(int.from_bytes(raw[i * 48:(i + 1) * 48], "little")
                 for i in range(3))


def g1_msm_mt(scalars: list, affine_points: list, nthreads: int = 0):
    """Multi-threaded native Pippenger (nthreads<=0: hardware threads).
    Same contract as ``g1_msm``; the honest machine-scale CPU baseline."""
    lib = _load_g1()
    if lib is None or not hasattr(lib, "g1_msm_mt"):
        return None
    n = len(scalars)
    sbuf = b"".join(int(k).to_bytes(32, "little") for k in scalars)
    pbuf = b"".join(int(x).to_bytes(48, "little") + int(y).to_bytes(48, "little")
                    for x, y in affine_points)
    out = ctypes.create_string_buffer(144)
    if lib.g1_msm_mt(sbuf, pbuf, n, int(nthreads), out) != 0:
        return None
    raw = out.raw
    return tuple(int.from_bytes(raw[i * 48:(i + 1) * 48], "little")
                 for i in range(3))


# -- native BLS12-377 pairing engine (native/pairing377.cpp) -----------------

_PAIR_LIB_PATH = os.path.join(_NATIVE_DIR, "libpairing377.so")
_PAIR_LIB = None
_PAIR_TRIED = False


def _load_pairing():
    global _PAIR_LIB, _PAIR_TRIED
    if _PAIR_TRIED:
        return _PAIR_LIB
    _PAIR_TRIED = True
    try:
        if not os.path.exists(_PAIR_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR, "libpairing377.so"],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_PAIR_LIB_PATH)
        lib.pairing377_multi.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         ctypes.c_long, ctypes.c_char_p]
        lib.pairing377_multi.restype = ctypes.c_int
        lib.pairing377_check.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         ctypes.c_long]
        lib.pairing377_check.restype = ctypes.c_int
        lib.g2_scalar_mul377.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         ctypes.c_char_p]
        lib.g2_scalar_mul377.restype = ctypes.c_int
        _PAIR_LIB = lib
    except Exception as exc:  # pragma: no cover
        log.debug("native pairing engine unavailable: %s", exc)
        _PAIR_LIB = None
    return _PAIR_LIB


def have_pairing() -> bool:
    return _load_pairing() is not None


def _enc_g1_affine(p) -> bytes:
    """Affine (x, y) canonical ints -> 96 LE bytes; None -> all-zero (inf)."""
    if p is None:
        return b"\0" * 96
    return int(p[0]).to_bytes(48, "little") + int(p[1]).to_bytes(48, "little")


def _enc_g2_affine(q) -> bytes:
    """Affine ((x0,x1),(y0,y1)) -> 192 LE bytes; None -> all-zero (inf)."""
    if q is None:
        return b"\0" * 192
    (x0, x1), (y0, y1) = q
    return b"".join(int(v).to_bytes(48, "little") for v in (x0, x1, y0, y1))


def pairing_check(pairs) -> bool | None:
    """prod_i e(P_i, Q_i) == 1? pairs: [(g1_affine, g2_affine)], None = inf.
    Returns True/False, or None if the native engine is missing or an input
    point is off-curve (caller falls back to the Python path, which decides
    what malformed means)."""
    lib = _load_pairing()
    if lib is None:
        return None
    g1b = b"".join(_enc_g1_affine(p) for p, _ in pairs)
    g2b = b"".join(_enc_g2_affine(q) for _, q in pairs)
    rc = lib.pairing377_check(g1b, g2b, len(pairs))
    if rc < 0:
        return None
    return rc == 1


def multi_pairing(pairs):
    """Exact reduced pairing product, bit-exact vs crypto/ref/pairing.py.
    Returns the flat-basis Fq12 tuple ((c0a, c0b), ..., (c5a, c5b)), or
    None if the engine is missing / input malformed."""
    lib = _load_pairing()
    if lib is None:
        return None
    g1b = b"".join(_enc_g1_affine(p) for p, _ in pairs)
    g2b = b"".join(_enc_g2_affine(q) for _, q in pairs)
    out = ctypes.create_string_buffer(1152)
    if lib.pairing377_multi(g1b, g2b, len(pairs), out) != 0:
        return None
    raw = out.raw
    return tuple(
        (int.from_bytes(raw[i * 96:i * 96 + 48], "little"),
         int.from_bytes(raw[i * 96 + 48:i * 96 + 96], "little"))
        for i in range(6)
    )


# distinct sentinel for a genuine infinity result from g2_scalar_mul —
# None is reserved for "engine missing / malformed input" (which callers
# answer with the slow Python fallback; a real infinity must NOT take it)
G2_INF = object()


def g2_scalar_mul(k: int, q):
    """k * Q on the G2 twist; affine in/out. Returns the affine pair,
    ``G2_INF`` when the result is the point at infinity, or None if the
    engine is missing / input malformed."""
    lib = _load_pairing()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(192)
    if lib.g2_scalar_mul377(int(k).to_bytes(32, "little"),
                            _enc_g2_affine(q), out) != 0:
        return None
    raw = out.raw
    if not any(raw):
        return G2_INF
    return (
        (int.from_bytes(raw[0:48], "little"), int.from_bytes(raw[48:96], "little")),
        (int.from_bytes(raw[96:144], "little"), int.from_bytes(raw[144:192], "little")),
    )


# -- native Poseidon-Fr sponge (native/poseidon377.cpp) ----------------------

_POS_LIB_PATH = os.path.join(_NATIVE_DIR, "libposeidon377.so")
_POS_LIB = None
_POS_TRIED = False
_POS_INITED_RATES: set = set()


def _load_poseidon():
    global _POS_LIB, _POS_TRIED
    if _POS_TRIED:
        return _POS_LIB
    _POS_TRIED = True
    try:
        if not os.path.exists(_POS_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR, "libposeidon377.so"],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_POS_LIB_PATH)
        lib.poseidon377_init.argtypes = [ctypes.c_int, ctypes.c_char_p,
                                         ctypes.c_char_p]
        lib.poseidon377_init.restype = ctypes.c_int
        lib.poseidon377_hash_many.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
            ctypes.c_char_p, ctypes.c_long,
        ]
        lib.poseidon377_hash_many.restype = ctypes.c_int
        lib.poseidon377_permute.argtypes = [ctypes.c_int, ctypes.c_char_p]
        lib.poseidon377_permute.restype = ctypes.c_int
        _POS_LIB = lib
    except Exception as exc:  # pragma: no cover
        log.debug("native poseidon engine unavailable: %s", exc)
        _POS_LIB = None
    return _POS_LIB


def have_poseidon() -> bool:
    return _load_poseidon() is not None


def _poseidon_ensure_rate(lib, rate: int) -> bool:
    """Generate (Python Grain-LFSR) and register ark/mds for a rate once."""
    if rate in _POS_INITED_RATES:
        return True
    if not (1 <= rate <= 8):
        return False
    from snarkos_tpu.crypto.ref import poseidon as pref

    ark, mds = pref.poseidon_params(rate)
    ark_b = b"".join(int(c).to_bytes(32, "little") for row in ark for c in row)
    mds_b = b"".join(int(c).to_bytes(32, "little") for row in mds for c in row)
    if lib.poseidon377_init(rate, ark_b, mds_b) != 0:
        return False
    _POS_INITED_RATES.add(rate)
    return True


def poseidon_hash_many(inputs, rate: int, num_outputs: int, domain_field: int):
    """Native duplex-sponge hash; returns list of canonical ints, or None
    if the engine is missing (caller falls back to pure Python)."""
    lib = _load_poseidon()
    if lib is None or not _poseidon_ensure_rate(lib, rate):
        return None
    from snarkos_tpu.crypto.params import FR_MODULUS

    inp = b"".join(int(x % FR_MODULUS).to_bytes(32, "little") for x in inputs)
    out = ctypes.create_string_buffer(32 * num_outputs)
    rc = lib.poseidon377_hash_many(
        rate, int(domain_field).to_bytes(32, "little"), inp, len(inputs),
        out, num_outputs,
    )
    if rc != 0:
        return None
    raw = out.raw
    return [int.from_bytes(raw[i * 32:(i + 1) * 32], "little")
            for i in range(num_outputs)]
