"""Cryptographic parameters and reference implementations.

``params`` holds the verified BLS12-377 / Edwards-BLS12 constants; the
``ref`` subpackage is the pure-Python arbitrary-precision ground truth that
every TPU kernel must match bit-exactly.
"""

from snarkos_tpu.crypto import params  # noqa: F401
