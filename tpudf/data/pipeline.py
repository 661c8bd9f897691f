"""Device-resident preprocessing graph.

The reference preprocesses on host CPU per-image (PIL/cv2 resize + per-crop
torch transforms; appv3.py:3223-3229, open_clip preprocess) — the TPU-native
design uploads uint8 images once and runs resize → crop → SigLIP
normalization fused inside the jitted graph (BASELINE.json north star).

All functions are batched and jit-safe (static output shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SIGLIP_MEAN = 0.5
SIGLIP_STD = 0.5


def normalize_siglip(x):
    """uint8/float [0,255]/[0,1] pixels → SigLIP-normalized float."""
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    return (x - SIGLIP_MEAN) / SIGLIP_STD


def resize_bilinear(x, size: int):
    """(B, H, W, C) → (B, size, size, C), antialiased bilinear (PIL-like)."""
    b, h, w, c = x.shape
    return jax.image.resize(x.astype(jnp.float32), (b, size, size, c),
                            method="bilinear", antialias=True)


def resize_bicubic(x, size: int):
    b, h, w, c = x.shape
    return jax.image.resize(x.astype(jnp.float32), (b, size, size, c),
                            method="cubic", antialias=True)


def center_crop(x, size: int):
    b, h, w, c = x.shape
    top = (h - size) // 2
    left = (w - size) // 2
    return jax.lax.dynamic_slice(x, (0, top, left, 0), (b, size, size, c))


def preprocess_for_siglip(x, image_size: int, method="bicubic"):
    """Full inference preprocessing: resize → normalize. Matches the
    open_clip SigLIP eval transform (resize to square, bicubic, 0.5/0.5)."""
    rs = resize_bicubic if method == "bicubic" else resize_bilinear
    if x.shape[1] != image_size or x.shape[2] != image_size:
        x = rs(x, image_size)
    return normalize_siglip(x)


def rgb_to_gray(x):
    """(B, H, W, 3) [0,1] → (B, H, W) luma (ITU-R 601, PIL convert('L'))."""
    w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    return jnp.einsum("bhwc,c->bhw", x, w)


# ----------------------------------------------------- multicrop inventory

def make_multicrops(x):
    """Batched 9-crop ensemble matching the reference (appv3.py:3315-3350):
    center(50%), left/right halves, top/bottom halves, 4 quadrants — each
    resized back to S so one padded ViT batch handles all views.

    x: (B, S, S, C) → crops (B, 9, S, S, C), weights (9,)
    """
    b, s, _, c = x.shape
    m = s // 2

    def crop(top, left, hh, ww):
        sl = jax.lax.dynamic_slice(x, (0, top, left, 0), (b, hh, ww, c))
        return jax.image.resize(sl, (b, s, s, c), method="bicubic")

    q = (s - m) // 2
    views = [
        crop(q, q, m, m),          # center 50%
        crop(0, 0, s, m),          # left half
        crop(0, s - m, s, m),      # right half
        crop(0, 0, m, s),          # top half
        crop(s - m, 0, m, s),      # bottom half
        crop(0, 0, m, m),          # quadrants
        crop(0, s - m, m, m),
        crop(s - m, 0, m, m),
        crop(s - m, s - m, m, m),
    ]
    weights = jnp.asarray([0.20] + [0.10] * 8)
    return jnp.stack(views, axis=1), weights


def make_patch_grid(x, grid: int = 4):
    """Patch-grid localization views (appv3.py:3381-3462: 4x4 sub-tiles each
    scored by the full expert stack). x: (B, S, S, C) →
    (B, grid*grid, S, S, C) upscaled tiles."""
    b, s, _, c = x.shape
    ps = s // grid
    tiles = []
    for i in range(grid):
        for j in range(grid):
            t = jax.lax.dynamic_slice(x, (0, i * ps, j * ps, 0),
                                      (b, ps, ps, c))
            tiles.append(jax.image.resize(t, (b, s, s, c), method="bilinear"))
    return jnp.stack(tiles, axis=1)


def tta_views(x, *, vflip=False, rot=False):
    """Flip/rotate TTA battery (appv3.py:5191-5210: h-flip always, v-flip &
    rot90 optional). x: (B, S, S, C) → (B, K, S, S, C), K in {2,3,4}."""
    views = [x, jnp.flip(x, axis=2)]
    if vflip:
        views.append(jnp.flip(x, axis=1))
    if rot:
        views.append(jnp.rot90(x, k=1, axes=(1, 2)))
    return jnp.stack(views, axis=1)


def rot90_view(x):
    """90° rotated dual view (appv3.py:3239-3247)."""
    return jnp.rot90(x, k=1, axes=(1, 2))
