"""Forensic anomaly-map tests: shapes + splice localization."""

import numpy as np
import jax.numpy as jnp

from tpudf.ops.forensic_maps import (cfa_anomaly_map, combined_anomaly_map,
                                     forensic_map_battery, heatmap_overlay,
                                     patch_anomaly_map, perlin_noise_map)


def _spliced_image(seed=0):
    """Noisy 'photo' with a smooth synthetic square pasted in the corner."""
    rng = np.random.default_rng(seed)
    img = np.clip(0.5 + 0.15 * rng.normal(0, 1, (256, 256, 3)), 0, 1)
    yy, xx = np.mgrid[0:96, 0:96] / 96.0
    smooth = np.stack([0.5 + 0.3 * yy, 0.5 + 0.3 * xx,
                       np.full_like(yy, 0.4)], -1)
    img[16:112, 16:112] = smooth
    return jnp.asarray(img[None], jnp.float32)


def test_battery_shapes():
    img = _spliced_image()
    maps = forensic_map_battery(img)
    assert set(maps) >= {"prnu_strength", "cfa_anomaly", "jpeg_residual",
                         "patch_variance", "multiscale_fft", "perlin",
                         "combined"}
    for k, m in maps.items():
        assert m.ndim == 3 and m.shape[0] == 1, k
        assert np.isfinite(np.asarray(m)).all(), k


def test_splice_localized():
    """The pasted smooth region should light up the perlin/patch maps more
    than the untouched area."""
    img = _spliced_image()
    m = np.asarray(perlin_noise_map(img[..., 0] * 0.299
                                    + img[..., 1] * 0.587
                                    + img[..., 2] * 0.114))[0]
    gh = m.shape[0]
    spl = m[:gh // 2, :gh // 2].mean()      # spliced quadrant
    rest = m[gh // 2:, gh // 2:].mean()
    assert spl > rest


def test_combined_map_normalized():
    img = _spliced_image()
    maps = forensic_map_battery(img)
    c = np.asarray(maps["combined"])[0]
    assert 0 <= c.min() and c.max() <= 1 + 1e-5


def test_heatmap_overlay_shape():
    img = (np.random.default_rng(0).random((128, 128, 3)) * 255
           ).astype(np.uint8)
    m = np.random.default_rng(1).random((4, 4))
    out = heatmap_overlay(img, m)
    assert out.shape == img.shape and out.dtype == np.uint8
