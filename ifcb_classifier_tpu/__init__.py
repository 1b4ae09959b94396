"""ifcb_classifier_tpu — a TPU-native IFCB plankton image classification framework.

A from-scratch JAX/Flax/XLA rebuild of the capabilities of WHOIGit/ifcb_classifier
(reference: neuston_net.py / neuston_data.py / neuston_models.py / neuston_callbacks.py),
designed TPU-first: device meshes + pjit/shard_map data parallelism, fused on-device
input preprocessing (resize-as-matmul on the MXU), bf16 compute, and a persistent
jit-compiled inference runner replacing the reference's per-bin Trainer teardown.

Subpackages:
  data/      IFCB bin ingestion (first-party .adc/.roi/.hdr reader), datasets, host pipeline
  models/    Flax CNN backbones (inception_v3+aux, resnet, densenet, vgg, alexnet,
             squeezenet, efficientnet) + torchvision weight porting
  ops/       device-side preprocessing ops (resize/normalize/flip), metrics
  parallel/  mesh construction and sharding helpers
  train/     train state, steps, loop, checkpointing
  infer/     batch inference runner over bins/image dirs
  results/   .json/.mat/.h5 result writers (byte-layout parity with the reference)
  utils/     templating, config serialization
"""

__version__ = "0.1.0"
