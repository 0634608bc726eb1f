"""simpledet_tpu — a TPU-native object detection & instance segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of tusen-ai/simpledet:
Faster/Mask/Cascade R-CNN, RetinaNet, FCOS, TridentNet and friends, composed from
Backbone/Neck/RpnHead/RoiExtractor/BboxHead components, trained with pjit data
parallelism over a device mesh and evaluated against COCO.

Layers (bottom-up):
  ops/      pure-jnp geometry core (IoU, box encode/decode, anchors, NMS)
  kernels/  Pallas/device kernels (RoIAlign, batched NMS)
  targets/  jit-compatible target assignment (anchor target, proposal target, ...)
  data/     host input pipeline (roidb, augmentations, loader)
  models/   Flax modules (ResNet, FPN, heads) + detector assemblies
  core/     train/eval engine, config system, metrics, schedules, checkpointing
  parallel/ device-mesh / sharding utilities
"""

__version__ = "0.1.0"
