"""snarkos_tpu — a TPU-native framework with the capabilities of snarkOS.

A from-scratch, TPU-first implementation of the Aleo node stack's
capabilities (reference: zosorock/snarkOS):

- ``snarkos_tpu.crypto``: BLS12-377 parameters and a pure-Python
  arbitrary-precision reference implementation (the bit-exactness ground
  truth for every TPU kernel).
- ``snarkos_tpu.ops``: batched limb-decomposed field arithmetic, Poseidon
  sponge, radix-2 NTT, and Pippenger MSM as JAX/Pallas TPU programs.
- ``snarkos_tpu.parallel``: multi-chip sharding (mesh construction,
  distributed NTT stage exchange, MSM bucket sharding + ICI reduction).
- ``snarkos_tpu.node``: the node harness — TCP stack, router/gateway
  planes, AleoBFT-style DAG consensus, block sync, ledger, REST, CLI.
"""

__version__ = "0.1.0"
