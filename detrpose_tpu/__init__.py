"""detrpose-tpu: a TPU-native (JAX/XLA/Pallas/pjit) real-time multi-person pose
estimation framework with the capabilities of DETRPose.

The package is organised bottom-up:

- ``ops``      pure-functional numerics (bilinear sampling, multi-scale deformable
               attention, FDR distribution regression, OKS, positional embeddings)
               plus an optional fused Pallas kernel for the deformable-attention
               gather (``ops/pallas``; the XLA gather stays default by
               measurement — see tools/pallas_bench.py).
- ``models``   flax.linen modules (NHWC, bf16-friendly): HGNetv2 backbone,
               HybridEncoder (AIFI + CSP-PAN), deformable pose decoder, post-process.
- ``data``     COCO / CrowdPose keypoint datasets, keypoint-aware augmentations,
               batching, and a self-contained OKS AP evaluator.
- ``train``    Hungarian matcher, VFL/L1/OKS criterion, OKS-aware denoising (CDN),
               EMA, optimisers, and the Trainer loop.
- ``parallel`` device-mesh utilities: batch-sharded pjit train/eval steps.
- ``core``     the lazy config system (executable Python configs -> object graph).
- ``utils``    torch-checkpoint conversion, orbax checkpointing, metric logging.
"""

__version__ = "0.1.0"
