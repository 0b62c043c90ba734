"""savont-tpu: a TPU-native ASV (Amplicon Sequence Variant) engine.

A from-scratch reimplementation of the capabilities of bluenote-1577/savont
(reference: /root/reference, v0.6.1) designed for TPU hardware:

- per-base / per-k-mer math is vectorized (NumPy host kernels + JAX/Pallas
  device kernels over fixed-shape padded read batches),
- all base-level alignment is a batched banded affine DP kernel
  (replaces the reference's minimap2 C FFI calls),
- consensus generation is seed + batched pileup-vote polish
  (replaces the reference's spoa C++ POA),
- scale-out is jax.sharding over a device Mesh (replaces rayon threads).

Pipeline (mirrors reference main.rs:49-196):
  reads -> k-mer count -> SNPmer calling -> TwinReads -> LSH k-mer clustering
  -> SNPmer subclustering + reclustering -> consensus + Bayesian polish
  -> dedup/merge -> chimera filter -> EM depth refinement -> ASVs
"""

__version__ = "0.1.0"
