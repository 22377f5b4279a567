"""deadtrees-tpu: TPU-native orthophoto dead-tree segmentation framework.

A ground-up JAX/Flax/XLA/Pallas rebuild of the capabilities of
cwerner/deadtrees (reference mounted at /root/reference): geo-preprocessing
→ tar-shard datasets → U-Net-family training with compound losses → scene
inference with on-device tiling/stitching → serving.

Subpackages:
    models   — Flax U-Net family (unet, unet++, resunet, resunet++,
               efficientunet++) × encoder zoo (resnet18/34,
               efficientnet-b0..b7), NHWC, bf16 compute / f32 params
    losses   — GDL/GWDL/dice/focal/boundary losses, metrics, on-device EDT
    data     — shard splitting, tar streaming, device prefetch, on-device
               augmentation, distance maps
    train    — jitted data-parallel train/eval steps, Adam+cosine,
               multistage schedule, training runtime
    parallel — device mesh + shardings (data parallelism over ICI)
    infer    — Tiler, jit sliding-window scene prediction, engines
               (single/ensemble/AOT-exported), GeoTIFF IO
    serve    — REST segmentation server + UI
    geo      — dependency-free shapefile reading + polygon rasterization
    config   — Hydra-style YAML config composition
"""

from deadtrees_tpu.version import __version__

__all__ = ["__version__"]
