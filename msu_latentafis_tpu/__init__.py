"""msu_latentafis_tpu — a TPU-native latent fingerprint identification engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MSU-LatentAFIS
(prip-lab): latent/rolled feature extraction (enhancement AEC, orientation /
frequency / quality maps, minutiae detection, patch descriptors, DR, PQ) and
a gallery-scale minutiae + texture matcher with second-order graph-consistency
filtering, redesigned for TPU hardware:

- the rolled gallery lives sharded in HBM as dense padded arrays;
- PQ asymmetric-distance scoring is reformulated as an MXU matmul
  (decode-on-the-fly) instead of a scalar LUT loop;
- graph filtering is a batched power iteration + vectorized greedy selection
  under vmap/pjit over the gallery axis;
- multi-chip scale-out uses jax.sharding.Mesh + collectives over ICI/DCN.

See SURVEY.md at the repo root for the structural analysis of the reference
system this framework reproduces (citations into /root/reference).
"""

__version__ = "0.1.0"
