"""Jit-compiled sliding-window scene prediction with on-device stitching.

The reference's batch inference path (/root/reference/scripts/inference.py:16-115)
round-trips every subtile through host numpy: Tiler → np.array_split → CPU
albumentations per subtile → H2D copy → model → D2H → numpy stitch. Here the
ENTIRE scene pass is one compiled program per padded scene shape:

    uint8 scene (TH, TW, C) → subtile blocks (reshape) → lax.map over
    fixed-size sub-batches (normalize folded into the model program) →
    argmax → validity mask → inverse block reshape → (TH, TW) class map

The scan keeps peak memory at one sub-batch of activations; blocks/stitch
are pure layout ops fused by XLA (replacing make/unmake_blocks_vectorized,
utils/data_handling.py:9-34); invalid (padding) subtiles are zeroed like the
reference writes zeros for skipped subtiles (tiler.py:150-155). Spatial
parallelism (SURVEY.md §5.7): the subtile batch axis shards over the
``data`` mesh axis for multi-chip scenes.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deadtrees_tpu.core.tpu_opts import tpu_compiler_options
from deadtrees_tpu.data.augment import normalize
from deadtrees_tpu.data.config import DATASET_CONFIG
from deadtrees_tpu.infer.blocks import make_blocks_nhwc, unmake_blocks_nhwc
from deadtrees_tpu.infer.tiler import Tiler


def make_scene_predictor(
    model,
    *,
    subtile: int = 512,
    batch_size: int = 128,
    mean: Sequence[float] = DATASET_CONFIG.mean,
    std: Sequence[float] = DATASET_CONFIG.std,
    mesh=None,
    packed: bool = False,
    tta: int = 0,
) -> Callable:
    """Build ``predict(params, batch_stats, scene_u8, valid) -> class map``.

    ``scene_u8`` is one scene (TH, TW, C) or a SCENE BATCH (S, TH, TW, C)
    with ``valid`` (N,) / (S, N). Batching scenes is the throughput lever:
    one 2048² scene yields only 16 subtiles of 512² (the reference Tiler
    default, tiler.py:37, and the measured-fastest regime — PERF.md r3:
    299 vs 261 tiles512/s at 256²) — below the chip's bs=128 sweet spot —
    so the driver should feed several scenes per dispatch
    (``predict_scenes`` does); all scenes' subtiles run through shared
    full-size model sub-batches.

    ``packed=True`` returns the 2-bit packed map (infer/packing.py,
    (…, TH, TW//4) uint8) — 4× less device→host transfer per scene;
    ``predict_scene(s)`` uses it transparently and unpacks on host.

    One compile per distinct padded scene-batch shape; scenes padded by the
    Tiler to a fixed ``tile_shape`` hit the cache every time.

    ``mesh``: a :class:`jax.sharding.Mesh` with a ``data`` axis enables
    spatial parallelism — the subtile batch inside each chunk is sharded
    across chips (the reference's SP analogue, SURVEY.md §5.7: independent
    Tiler subtiles fan out across devices; XLA partitions the whole scene
    program, no host round-trips).
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        chunk_sharding = NamedSharding(mesh, P(None, "data"))
        out_sharding = NamedSharding(mesh, P())
    else:
        chunk_sharding = out_sharding = None

    @partial(jax.jit, static_argnames=(),
             compiler_options=tpu_compiler_options())
    def predict(params, batch_stats, scene_u8, valid):
        squeeze = scene_u8.ndim == 3
        if squeeze:
            scene_u8 = scene_u8[None]
            valid = valid[None]
        ns, th, tw, c = scene_u8.shape
        m = tuple(mean)[:c]
        s = tuple(std)[:c]

        blocks = jax.vmap(lambda sc: make_blocks_nhwc(sc, subtile))(scene_u8)
        n = blocks.shape[1]  # subtiles per scene
        blocks = blocks.reshape(ns * n, subtile, subtile, c)
        pad = (-(ns * n)) % batch_size
        blocks = jnp.pad(blocks, ((0, pad), (0, 0), (0, 0), (0, 0)))
        chunks = blocks.reshape(-1, batch_size, subtile, subtile, c)
        if chunk_sharding is not None:
            chunks = jax.lax.with_sharding_constraint(chunks, chunk_sharding)

        def run_chunk(chunk):
            img = normalize(chunk.astype(jnp.float32), m, s)

            def logits_fn(x):
                return model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    x, train=False,
                )

            if tta:
                from deadtrees_tpu.infer.tta import make_tta_fn

                scores = make_tta_fn(logits_fn, tta)(img)
            else:
                scores = logits_fn(img)
            return jnp.argmax(scores, axis=-1).astype(jnp.uint8)

        preds = jax.lax.map(run_chunk, chunks)  # (n_chunks, bs, d, d)
        preds = preds.reshape(-1, subtile, subtile)[: ns * n]
        preds = preds * valid.reshape(-1)[:, None, None].astype(jnp.uint8)
        out = jax.vmap(
            lambda p: unmake_blocks_nhwc(p, th, tw)
        )(preds.reshape(ns, n, subtile, subtile))
        if packed:
            from deadtrees_tpu.infer.packing import pack2

            out = pack2(out)
        if out_sharding is not None:
            out = jax.lax.with_sharding_constraint(out, out_sharding)
        return out[0] if squeeze else out

    return predict


def predict_scene(
    model,
    variables,
    scene: np.ndarray,
    *,
    tile_shape: Tuple[int, int] = (2048, 2048),
    subtile: int = 512,
    batch_size: int = 128,
    predictor: Optional[Callable] = None,
    mean: Sequence[float] = DATASET_CONFIG.mean,
    std: Sequence[float] = DATASET_CONFIG.std,
    tta: int = 0,
) -> np.ndarray:
    """Convenience wrapper: (H, W, C) scene → (H, W) class map (cropped)."""
    tiler = Tiler(tile_shape=tile_shape, subtile_shape=(subtile, subtile))
    tiler.load_array(scene)
    # packed transfer: 4× less D2H per scene (measured ~20% of scene wall
    # time on the bench attachment); unpacked transparently here
    fn = predictor or make_scene_predictor(
        model, subtile=subtile, batch_size=batch_size, mean=mean, std=std,
        packed=True, tta=tta,
    )
    out = np.asarray(
        fn(
            variables["params"],
            variables["batch_stats"],
            jnp.asarray(tiler._indata),
            jnp.asarray(tiler.subtiles_to_use),
        )
    )
    th = tiler._indata.shape[0]
    tw = tiler._indata.shape[1]
    if out.shape == (th, tw):  # custom predictor returned an unpacked map
        tiler._outdata = out
    else:
        from deadtrees_tpu.infer.packing import unpack2

        tiler._outdata = unpack2(out, tw)
    return tiler.prediction


def predict_scenes(
    model,
    variables,
    scenes: Sequence[np.ndarray],
    *,
    tile_shape: Tuple[int, int] = (2048, 2048),
    subtile: int = 512,
    batch_size: int = 128,
    scenes_per_dispatch: Optional[int] = None,
    predictor: Optional[Callable] = None,
    mean: Sequence[float] = DATASET_CONFIG.mean,
    std: Sequence[float] = DATASET_CONFIG.std,
    tta: int = 0,
) -> list:
    """Batched scene inference: N scenes → N (H, W) class maps.

    The production workload is thousands of 2048² orthophoto tiles
    (reference scripts/inference.py:16-115). One 2048² scene = 16 subtiles
    of 512², which underfills the chip (the bs=128 sweet spot needs 8);
    this wrapper packs ``scenes_per_dispatch`` scenes per compiled call
    (default: enough to fill one ``batch_size`` model sub-batch) and keeps
    dispatches pipelined — JAX's async dispatch overlaps scene k+1's H2D
    with scene k's compute. The tail group reuses the same compiled program
    by padding with a zero scene.
    """
    from deadtrees_tpu.infer.packing import unpack2

    per_scene = (tile_shape[0] // subtile) * (tile_shape[1] // subtile)
    if scenes_per_dispatch is None:
        scenes_per_dispatch = max(1, batch_size // per_scene)
    fn = predictor or make_scene_predictor(
        model, subtile=subtile, batch_size=batch_size, mean=mean, std=std,
        packed=True, tta=tta,
    )

    scenes = list(scenes)
    results: list = [None] * len(scenes)
    g = scenes_per_dispatch
    pending: list = []  # ≤2 in-flight dispatches: overlap H2D/compute/D2H

    def drain(entry):
        idx, group_tilers, out = entry
        host = np.asarray(out)  # (g, TH, TW//4) packed
        for j, i in enumerate(idx):
            t = group_tilers[j]
            t._outdata = unpack2(host[j], t._indata.shape[1])
            results[i] = t.prediction

    for start in range(0, len(scenes), g):
        idx = list(range(start, min(start + g, len(scenes))))
        group_tilers = []
        for i in idx:
            t = Tiler(tile_shape=tile_shape, subtile_shape=(subtile, subtile))
            t.load_array(scenes[i])
            group_tilers.append(t)
        stack = np.stack([t._indata for t in group_tilers])
        vstack = np.stack([t.subtiles_to_use for t in group_tilers])
        if len(idx) < g:  # pad the tail group: same compiled shape
            pad = g - len(idx)
            stack = np.concatenate(
                [stack, np.zeros((pad,) + stack.shape[1:], stack.dtype)]
            )
            vstack = np.concatenate(
                [vstack, np.zeros((pad,) + vstack.shape[1:], vstack.dtype)]
            )
        out = fn(
            variables["params"], variables["batch_stats"],
            jnp.asarray(stack), jnp.asarray(vstack),
        )
        pending.append((idx, group_tilers, out))
        if len(pending) > 1:  # cap at 2 in flight (incl. the one just sent)
            drain(pending.pop(0))

    for entry in pending:
        drain(entry)
    return results
