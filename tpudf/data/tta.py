"""Named TTA transform battery (batch inference).

Device equivalents of the reference's 9 named TTA transforms
(inference_deepfakeface_complete.py:84-128, 220-314): identity, flips,
rotations, CLAHE-like local contrast, sharpen, edge-enhance, brightness.
All pure (B, H, W, 3) [0,1] → same-shape transforms that stack into one
padded ViT batch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpudf.data.augment import clahe_approx, gaussian_blur


def identity(x):
    return x


def hflip(x):
    return jnp.flip(x, axis=2)


def vflip(x):
    return jnp.flip(x, axis=1)


def rot90(x):
    return jnp.rot90(x, 1, (1, 2))


def rot180(x):
    return jnp.rot90(x, 2, (1, 2))


def rot270(x):
    return jnp.rot90(x, 3, (1, 2))


def clahe(x):
    return clahe_approx(x)


def sharpen(x, amount=1.0):
    """Unsharp mask."""
    blur = gaussian_blur(x, sigma=1.0, radius=2)
    return jnp.clip(x + amount * (x - blur), 0.0, 1.0)


def edge_enhance(x):
    """PIL EDGE_ENHANCE-style kernel via unsharp with stronger center."""
    blur = gaussian_blur(x, sigma=0.8, radius=1)
    return jnp.clip(1.5 * x - 0.5 * blur, 0.0, 1.0)


def brightness(x, delta=0.1):
    return jnp.clip(x + delta, 0.0, 1.0)


TTA_TRANSFORMS = {
    "identity": identity,
    "hflip": hflip,
    "vflip": vflip,
    "rot90": rot90,
    "rot180": rot180,
    "rot270": rot270,
    "clahe": clahe,
    "sharpen": sharpen,
    "edge_enhance": edge_enhance,
}


def tta_batch(x, names=None):
    """(B, S, S, 3) → (B, K, S, S, 3) stacked named TTA views."""
    names = names or list(TTA_TRANSFORMS)
    return jnp.stack([TTA_TRANSFORMS[n](x) for n in names], axis=1), names


def jitter_views(rng, x, n=4, max_angle_deg=2.0, max_shift=0.02):
    """Small random rotate+translate preview views (appv3.py:3353-3375
    jitter_augment): used by the app's stability collage. Rotation via the
    three-shear decomposition is overkill for ±2°; a shifted bilinear
    resample approximates it on device."""
    import jax
    b, h, w, c = x.shape
    keys = jax.random.split(rng, n)
    views = []
    for k in keys:
        k1, k2 = jax.random.split(k)
        dy = jax.random.uniform(k1, (), minval=-max_shift, maxval=max_shift)
        dx = jax.random.uniform(k2, (), minval=-max_shift, maxval=max_shift)
        sy = jnp.clip(jnp.round(dy * h).astype(jnp.int32), -h // 8, h // 8)
        sx = jnp.clip(jnp.round(dx * w).astype(jnp.int32), -w // 8, w // 8)
        views.append(jnp.roll(x, (sy, sx), axis=(1, 2)))
    return jnp.stack(views, axis=1)           # (B, n, H, W, C)


def tta_aggregate(logits, axis=1, mode="mean"):
    """Aggregate per-view logits: mean (default) or trimmed mean."""
    if mode == "mean":
        return jnp.mean(logits, axis=axis)
    if mode == "median":
        return jnp.median(logits, axis=axis)
    srt = jnp.sort(logits, axis=axis)
    k = logits.shape[axis]
    lo, hi = max(1, k // 8), k - max(1, k // 8)
    return jnp.mean(jax.lax.slice_in_dim(srt, lo, hi, axis=axis), axis=axis)
