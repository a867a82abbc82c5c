"""tpugan_tpu — a TPU-native JAX/Pallas framework for temporal point-cloud
upsampling GANs (the capabilities of TPU-GAN, ICLR 2022).

Layering (mirrors SURVEY.md §1 of this repo):

  ops/       neighborhood & geometry kernel library (kNN, ball query, FPS,
             grouping, Chamfer, auction EMD, SPH-kernel interpolation) —
             the TPU-native replacement for the reference's CUDA extensions
             (pointnet2_ops, FRNN, pytorch3d.knn_points, chamferdist, emd).
  nn/        flax module library (SharedMLP, EdgeConv, Inception-DenseGCN,
             set abstraction, FlowEmbedding) over padded [B, N, C] tensors.
  models/    SRNet / NoMaskSRNet generators; spatial & temporal
             discriminators; ActionCls transfer classifier.
  losses/    Chamfer / masking / repulsion / density / uniformity /
             temporal / LSGAN losses on masked batches.
  data/      host-side numpy input pipeline (fluid 3-frame siamese sampler,
             MSR-Action3D clips, synthetic fixtures, bgeo I/O).
  train/     jit-compiled three-optimizer GAN train step + checkpointing.
  parallel/  jax.sharding.Mesh helpers and data-parallel (pjit/shard_map)
             train steps with gradient allreduce over ICI.
  eval/      rollout inference, CD/EMD/MMD analysis, cycle consistency.
  cli/       entry points mirroring the reference's argparse surfaces.

Core data model: fixed-shape padded point batches. A cloud is `pos[B, N, 3]`
(f32) plus a `valid[B, N]` bool mask; padded/pruned points sit at the
`PAD_SENTINEL` coordinate (999, matching the reference's dummy-point protocol,
reference upsampling_network.py:149) so that even unmasked consumers behave
like the reference. Every op in `ops/` consumes and produces masks.
"""

PAD_SENTINEL = 999.0

__version__ = "0.1.0"
