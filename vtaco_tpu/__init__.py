"""vtaco_tpu — a TPU-native (JAX/XLA/Pallas) visual-tactile in-hand object
reconstruction framework.

Re-designed from scratch with the capabilities of the VTacO reference
pipeline (jeffsonyu/VTacO): convolutional occupancy networks conditioned on
partial object point clouds, five DIGIT-style tactile images and MANO hand
pose, with mesh extraction via dense occupancy decode + marching cubes.

Layering (see SURVEY.md):
  core/      config system, registries, checkpoints, RNG
  ops/       numeric kernels (scatter pooling, grid interpolation, geometry,
             metrics, winding numbers) incl. fused Pallas decode
  models/    flax.linen modules (encoders, decoders, MANO, fusion, composite)
  data/      npz field readers, transforms, batched host pipeline
  train/     jitted train/eval steps for every loss path + training loop
  generate/  mesh extraction (device decode + native marching cubes)
  parallel/  jax.sharding.Mesh helpers and sharding plans
  native/    C++ host extensions (marching cubes, mesh IO)
"""

__version__ = "0.1.0"

import jax as _jax

# Full-precision f32 matmuls by default: parity with the fp32 reference
# matters for geometry/metrics. Hot model paths opt into bf16 explicitly
# (dtype casts / per-op precision), which is faster AND more deliberate than
# letting every f32 matmul silently run in low precision.
_jax.config.update("jax_default_matmul_precision", "highest")
