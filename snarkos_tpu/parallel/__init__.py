"""Multi-chip sharding: mesh construction, distributed NTT and MSM.

The reference scales by replicating whole nodes over committees and by
rayon threads within a node (SURVEY.md §2.11); the TPU-native design
instead shards the heavy kernels across a device mesh and exchanges data
over ICI with XLA collectives (all_to_all for NTT stage exchange,
all_gather + tree reduction for MSM partial sums).
"""
