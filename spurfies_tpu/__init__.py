"""spurfies_tpu — TPU-native sparse-view neural surface reconstruction.

A from-scratch JAX/XLA/Pallas framework with the capabilities of Spurfies
(arXiv:2408.16544): per-scene sparse-view (3 image) surface reconstruction
with neural points, a frozen local-geometry SDF prior, and VolSDF-style
differentiable volume rendering.

Design principles (TPU-first, not a port):
  * Static shapes everywhere: dense ``[R, S, K]`` neighbor tensors with
    validity masks replace the reference's ragged ``masked_select`` pipelines.
  * The per-(sample, neighbor)-pair MLPs are laid out as large batched
    matmuls that map straight onto the MXU.
  * The CUDA ``torch_knnquery`` voxel grid becomes a static-shape voxel-hash
    table built with XLA scatters and queried with gathers (Pallas kernel for
    the fused candidate-gather + top-k path).
  * Multi-chip scaling via ``jax.sharding.Mesh`` over the ray axis with
    replicated parameters and psum'd gradients.
"""

__version__ = "0.1.0"
