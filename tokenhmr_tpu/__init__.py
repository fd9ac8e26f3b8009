"""tokenhmr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) human-mesh-recovery framework.

Re-designed from scratch with the capabilities of TokenHMR (CVPR 2024):
a two-stage HMR system (PoseVQ tokenizer + ViT-H token-prediction model)
built TPU-first: functional model definitions, SPMD sharding over device
meshes, Pallas kernels for the hot ops, and a native (C++) host-side
preprocessing pipeline.

Layout:
  ops/       pure math kernels (rotations, projection, Procrustes, crop
             affine, Pallas attention / warp kernels)
  models/    flax model definitions (ViT-H, token head, PoseVQ, SMPL, ...)
  data/      host-side data pipeline (datasets, augmentation, filters)
  parallel/  mesh construction + sharding rules (dp/fsdp/tp)
  train/     losses, optimizers, train steps, checkpointing
  utils/     config, evaluator, logging, rendering
  convert/   PyTorch-checkpoint -> JAX param-tree converters
  native/    C++ host preprocessing library
"""

__version__ = "0.1.0"
