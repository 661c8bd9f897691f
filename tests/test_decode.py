"""Native C++ JPEG decoder tests (skipped if cpp/libtpudf_decode.so absent —
build with `make -C cpp`)."""

import os

import numpy as np
import pytest
from PIL import Image

from tpudf.data import decode


pytestmark = pytest.mark.skipif(not decode.available(),
                                reason="native decoder not built")


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        arr = (rng.random((180 + 20 * i, 240, 3)) * 255).astype(np.uint8)
        p = str(d / f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=92)
        paths.append(p)
    return paths


def test_decode_batch(jpegs):
    out, status = decode.decode_batch(jpegs, 128)
    assert out.shape == (6, 128, 128, 3)
    assert (status == 0).all()
    # content sanity vs PIL: compare 8x8 local means (resampling kernels
    # differ per-pixel on noise images; local averages must agree)
    ref = np.asarray(Image.open(jpegs[0]).resize((128, 128), Image.BILINEAR))
    ours_means = out[0].reshape(16, 8, 16, 8, 3).mean((1, 3))
    ref_means = ref.reshape(16, 8, 16, 8, 3).mean((1, 3))
    assert np.abs(ours_means - ref_means).mean() < 6.0


def test_decode_failure_status(jpegs, tmp_path):
    bad = str(tmp_path / "nope.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg")
    out, status = decode.decode_batch([jpegs[0], bad], 64)
    assert status[0] == 0 and status[1] != 0


def test_decode_resize_single(jpegs):
    arr = decode.decode_resize(jpegs[1], 96)
    assert arr is not None and arr.shape == (96, 96, 3)
