"""deadtrees-tpu: a TPU-native orthophoto dead-tree segmentation framework.

A ground-up JAX/Flax/XLA/Pallas rebuild of the capabilities of the reference
``cwerner/deadtrees`` stack (see SURVEY.md): WebDataset-style shard input
pipeline with on-device fused augmentation, a Flax U-Net model family
(unet / unet++ / resunet / resunet++ / efficientunet++) with ResNet and
EfficientNet encoders, the boundary-loss compound loss suite, data-parallel
training over a ``jax.sharding.Mesh``, sliding-window scene inference with
on-device stitching, and a serving demo.

Subpackages are imported lazily; ``import deadtrees_tpu`` is cheap.
"""

from deadtrees_tpu.version import __version__

__all__ = ["__version__"]
