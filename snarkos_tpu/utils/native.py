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
