"""Pure-Python arbitrary-precision reference implementations.

This subpackage is the bit-exactness ground truth (BASELINE.md requires
CPU-verifiable vectors): every TPU kernel in ``snarkos_tpu.ops`` and
``snarkos_tpu.parallel`` is tested element-for-element against these
implementations. They are written for clarity and auditability, not speed.
"""
