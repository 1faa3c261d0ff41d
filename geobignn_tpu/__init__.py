"""GeoBi-GNN TPU: a TPU-native bi-domain mesh-denoising GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the GeoBi-GNN
reference (PyTorch + PyTorch-Geometric): dual vertex-graph / facet-graph
U-Nets with feature-steered graph convolutions, Graclus-style graph pooling,
differentiable cross-domain vertex->facet feature transfer, joint
position+normal training, and an inference pipeline with submesh stitching
and iterative normal-field vertex updates.

Design pillars (TPU-first, not a port):
  * static padded shapes everywhere — pooling hierarchies are precomputed on
    the host and shipped to the device as static gather/scatter index arrays,
    so the full dual U-Net compiles to a single XLA program;
  * feature-steered convolution expressed as dense matmuls (MXU) plus masked
    segment reductions, with a fused Pallas kernel for the hot path;
  * scaling via `jax.sharding.Mesh` + `shard_map`: data-parallel over meshes
    and edge-partitioned graph parallelism with XLA collectives over ICI.
"""

__version__ = "0.1.0"

from geobignn_tpu import geometry, meshio  # noqa: F401
