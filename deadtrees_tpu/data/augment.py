"""On-device augmentation: dihedral flips/rotations + color jitter + normalize.

TPU-native replacement for the reference's albumentations CPU pipeline
(/root/reference/deadtrees/data/deadtreedata.py:132-154):

    train: OneOf(HFlip, VFlip) p=0.5 → RandomRotate90 p=0.5 →
           RandomBrightnessContrast(p=0.5, brightness_limit=0.2,
           contrast_limit=0.15, brightness_by_max=False) → Normalize
    val:   Normalize only

Semantics preserved exactly (verified against albumentations in
tests/test_augment.py):

- OneOf p=0.5 picks H- or V-flip uniformly (both inner p=0.5);
- RandomRotate90 draws k ∈ {0,1,2,3} uniformly, applies with p=0.5;
- brightness/contrast on uint8 goes through albumentations' LUT math:
  ``out = uint8(clip(v*alpha + beta*mean(img), 0, 255))`` with
  alpha = 1+U(-0.15,0.15), beta = U(-0.2,0.2), mean over all pixels+bands
  (``brightness_by_max=False``);
- Normalize: ``(x - 255*mean) / (255*std)``.

Whereas the reference runs this per-sample on DataLoader worker CPUs, here
the whole batch is augmented in one compiled program on device: geometric
ops are XLA copies, and the per-pixel arithmetic chain is fused into a
single HBM pass — optionally via the Pallas kernel in
:mod:`deadtrees_tpu.ops.augment_pallas`.

The signed-distance maps for the boundary loss are computed downstream from
the AUGMENTED mask (the reference computes them post-augmentation too,
deadtreedata.py:182-187), so augmentation never touches distmaps.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from deadtrees_tpu.data.config import DATASET_CONFIG


def sample_augment_params(rng: jax.Array, batch: int) -> Dict[str, jnp.ndarray]:
    """Draw per-sample augmentation parameters (albumentations semantics)."""
    k_flip, k_which, k_rot, k_rotk, k_bc, k_alpha, k_beta = jax.random.split(rng, 7)
    flip_on = jax.random.bernoulli(k_flip, 0.5, (batch,))
    flip_v = jax.random.bernoulli(k_which, 0.5, (batch,))  # True→VFlip, False→HFlip
    rot_on = jax.random.bernoulli(k_rot, 0.5, (batch,))
    rot_k = jax.random.randint(k_rotk, (batch,), 0, 4)  # k ∈ {0..3}
    bc_on = jax.random.bernoulli(k_bc, 0.5, (batch,))
    alpha = 1.0 + jax.random.uniform(k_alpha, (batch,), minval=-0.15, maxval=0.15)
    beta = jax.random.uniform(k_beta, (batch,), minval=-0.2, maxval=0.2)
    return {
        "flip_h": flip_on & ~flip_v,
        "flip_v": flip_on & flip_v,
        "rot_k": jnp.where(rot_on, rot_k, 0),
        "alpha": jnp.where(bc_on, alpha, 1.0),
        "beta": jnp.where(bc_on, beta, 0.0),
    }


def _apply_dihedral(x: jnp.ndarray, flip_h, flip_v, rot_k) -> jnp.ndarray:
    """Per-sample flips + rot90 on a batched (B, H, W, ...) array.

    The rot90 select computes all four rotations and picks per sample —
    4 extra copies of a uint8 batch, negligible next to the model conv cost,
    and it keeps the program free of data-dependent control flow.
    """
    expand = (slice(None),) + (None,) * (x.ndim - 1)
    x = jnp.where(flip_h[expand], jnp.flip(x, axis=2), x)
    x = jnp.where(flip_v[expand], jnp.flip(x, axis=1), x)

    # np.rot90 CCW in the (H, W) plane, batched
    r1 = jnp.flip(jnp.swapaxes(x, 1, 2), axis=1)
    r2 = jnp.flip(jnp.flip(x, axis=1), axis=2)
    r3 = jnp.flip(jnp.swapaxes(x, 1, 2), axis=2)
    k = rot_k[expand]
    return jnp.where(k == 1, r1, jnp.where(k == 2, r2, jnp.where(k == 3, r3, x)))


def _color_jitter_u8(img: jnp.ndarray, alpha, beta) -> jnp.ndarray:
    """albumentations uint8 LUT brightness/contrast with brightness_by_max=False.

    lut[v] = clip(v*alpha + beta*mean(img), 0, 255) truncated to uint8.
    """
    x = img.astype(jnp.float32)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    out = x * alpha[:, None, None, None] + beta[:, None, None, None] * mean
    return jnp.floor(jnp.clip(out, 0.0, 255.0))


def normalize(img_f32: jnp.ndarray, mean, std) -> jnp.ndarray:
    """albumentations Normalize for uint8-ranged input: (x - 255m) / (255s)."""
    mean = jnp.asarray(mean, jnp.float32) * 255.0
    std = jnp.asarray(std, jnp.float32) * 255.0
    return (img_f32 - mean) / std


@partial(jax.jit, static_argnames=("train", "use_pallas"))
def augment_batch(
    rng: jax.Array,
    image_u8: jnp.ndarray,  # (B, H, W, C) uint8
    mask: Optional[jnp.ndarray] = None,  # (B, H, W) integer
    lu: Optional[jnp.ndarray] = None,  # (B, H, W) integer
    *,
    train: bool = True,
    mean: Tuple[float, ...] = DATASET_CONFIG.mean,
    std: Tuple[float, ...] = DATASET_CONFIG.std,
    use_pallas: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Full train/val transform on device. Returns dict with 'image' f32
    (normalized) and geometrically-matched 'mask'/'lu'.

    ``use_pallas=True`` routes the image path through the fused single-pass
    kernel (ops/augment_pallas.py); masks are tiny and stay on the XLA
    path either way."""
    c = image_u8.shape[-1]
    mean = tuple(mean)[:c]
    std = tuple(std)[:c]

    if not train:
        out = {"image": normalize(image_u8.astype(jnp.float32), mean, std)}
        if mask is not None:
            out["mask"] = mask.astype(jnp.int32)
        if lu is not None:
            out["lu"] = lu.astype(jnp.int32)
        return out

    params = sample_augment_params(rng, image_u8.shape[0])
    if use_pallas:
        from deadtrees_tpu.ops.augment_pallas import augment_pallas

        # geometry in XLA (pure layout ops; Mosaic has no `rev`), fused
        # color-jitter + normalize in one Pallas VMEM pass
        interp = jax.devices()[0].platform != "tpu"
        img_geo = _apply_dihedral(
            image_u8, params["flip_h"], params["flip_v"], params["rot_k"]
        )
        img_norm = augment_pallas(
            img_geo, params["alpha"], params["beta"],
            mean=mean, std=std, interpret=interp,
        )
        out = {"image": img_norm}
    else:
        img = _apply_dihedral(
            image_u8, params["flip_h"], params["flip_v"], params["rot_k"]
        )
        img = _color_jitter_u8(img, params["alpha"], params["beta"])
        out = {"image": normalize(img, mean, std)}
    if mask is not None:
        out["mask"] = _apply_dihedral(
            mask, params["flip_h"], params["flip_v"], params["rot_k"]
        ).astype(jnp.int32)
    if lu is not None:
        out["lu"] = _apply_dihedral(
            lu, params["flip_h"], params["flip_v"], params["rot_k"]
        ).astype(jnp.int32)
    return out
