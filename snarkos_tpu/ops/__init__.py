"""TPU compute kernels: batched limb arithmetic, Poseidon, NTT, MSM.

Design (SURVEY.md §7 Phase 1): field elements are little-endian 16-bit
limbs in int32 lanes, stored limbs-first — shape ``(nlimbs, *batch)`` — so
each limb row is a contiguous vector register-friendly slab and per-limb
ops are full-width VPU ops. All kernels are bit-exact against
``snarkos_tpu.crypto.ref``.
"""
