"""Device preprocessing / augmentation graph tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tpudf.data.augment import (clahe_approx, jpeg_simulate, random_hflip,
                                random_jpeg, train_augment)
from tpudf.data.pipeline import (center_crop, make_multicrops,
                                 make_patch_grid, normalize_siglip,
                                 preprocess_for_siglip, rgb_to_gray,
                                 tta_views)
from tpudf.ops.dct import dct2_8x8, idct2_8x8


def _img(b=2, s=64):
    return jnp.asarray(
        np.random.default_rng(0).random((b, s, s, 3)).astype(np.float32))


def test_normalize_siglip_uint8():
    x = jnp.asarray(np.full((1, 4, 4, 3), 255, np.uint8))
    y = normalize_siglip(x)
    np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-6)


def test_multicrops_shapes_weights():
    crops, w = make_multicrops(_img())
    assert crops.shape == (2, 9, 64, 64, 3)
    np.testing.assert_allclose(float(jnp.sum(w)), 1.0, atol=1e-6)


def test_patch_grid_reconstructs_tiles():
    x = _img(1, 64)
    tiles = make_patch_grid(x, 4)
    assert tiles.shape == (1, 16, 64, 64, 3)
    # first tile upsampled from top-left 16x16 corner: mean preserved approx
    tl = np.asarray(x[0, :16, :16]).mean()
    np.testing.assert_allclose(np.asarray(tiles[0, 0]).mean(), tl, atol=0.02)


def test_tta_views():
    v = tta_views(_img(), vflip=True, rot=True)
    assert v.shape == (2, 4, 64, 64, 3)


def test_dct_roundtrip():
    x = _img(1, 32)[..., 0] * 255
    rec = idct2_8x8(dct2_8x8(x))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-3)


def test_jpeg_simulate_degrades_monotonically():
    x = _img(1, 64)
    e_hi = float(jnp.mean((jpeg_simulate(x, 90) - x) ** 2))
    e_lo = float(jnp.mean((jpeg_simulate(x, 5) - x) ** 2))
    assert e_lo > e_hi


def test_train_augment_runs_and_preserves_shape():
    x = _img(4, 32)
    y = train_augment(jax.random.key(0), x, jpeg=True, rot=True)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0


def test_hflip_is_involution_at_p1():
    x = _img()
    y = random_hflip(jax.random.key(0), x, p=1.0)
    np.testing.assert_allclose(np.asarray(jnp.flip(y, axis=2)),
                               np.asarray(x))


def test_clahe_bounded():
    x = _img()
    y = clahe_approx(x)
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0
