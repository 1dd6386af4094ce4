"""internet-tpu: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of InterNet.

Feature Intertwiner for Object Detection (ICLR 2019). Same capabilities as
the PyTorch reference ``hli2020/feature_intertwiner`` (see SURVEY.md), built
TPU-first:

- ``ops``        pure array ops: box math, anchors, RoIAlign/RoIPool (Pallas +
                 XLA reference), exact batched NMS, Sinkhorn OT.
- ``models``     flax.linen modules: ResNet-50/101, FPN, RPN, Dev
                 (feature-intertwiner RoI stage), Classifier/Mask heads, and
                 the InterNet top-level model.
- ``train``      functional train/eval steps, losses, target assignment,
                 optimizer/schedule, checkpointing.
- ``parallel``   device-mesh construction and sharding rules (SPMD data
                 parallelism over ICI replacing the reference's
                 nn.DataParallel).
- ``data``       host-side COCO pipeline (resize/pad/flip/mini-mask) feeding
                 fixed-shape batches.
- ``evaluation`` COCO-style mAP evaluation with a native C RLE mask library.
"""

__version__ = "0.1.0"
