"""SID_Set mapping fixture test (no network): synthetic in-memory records
exercising `sid_example_to_arrays` label/mask semantics and the collate
normalization, mirroring siglip2siddataset.py:867-938.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from tpudf.data.datasets import SID_LABELS, sid_example_to_arrays
from tpudf.data.pipeline import normalize_siglip


def _img(seed, size=64):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 256, (size, size, 3), np.uint8))


def test_real_example_mapping():
    out = sid_example_to_arrays({"image": _img(0), "label": 0}, 32)
    assert out["pixels"].shape == (32, 32, 3)
    assert out["pixels"].dtype == np.uint8
    assert out["cls"] == 0 and out["binary"] == 0.0
    assert not out["has_mask"]
    assert out["mask"].shape == (32, 32) and out["mask"].sum() == 0


def test_synthetic_example_mapping_string_label():
    # labels arrive as strings in some HF revisions (ref :871)
    out = sid_example_to_arrays({"image": _img(1),
                                 "label": "fully_synthetic"}, 32)
    assert out["cls"] == 1 and out["binary"] == 1.0
    assert not out["has_mask"]


def test_tampered_example_with_mask():
    # 64px mask, top-left quadrant tampered at intensity 200 (>127 → 1)
    m = np.zeros((64, 64), np.uint8)
    m[:32, :32] = 200
    out = sid_example_to_arrays(
        {"image": _img(2), "label": 2, "mask": Image.fromarray(m)}, 32)
    assert out["cls"] == 2 and out["binary"] == 1.0
    assert out["has_mask"]
    # NEAREST-resized binarized mask: exactly the top-left 16x16 is 1
    assert out["mask"].shape == (32, 32)
    assert out["mask"][:16, :16].min() == 1.0
    assert out["mask"][16:, :].max() == 0.0 and out["mask"][:, 16:].max() == 0.0


def test_tampered_mask_3channel_binarize_threshold():
    # 3-channel mask takes channel 0; values <= 127 binarize to 0 (ref :889-891)
    m = np.zeros((32, 32, 3), np.uint8)
    m[:, :, 0] = 127          # exactly at threshold → 0
    m[:8, :, 0] = 128         # just above → 1
    out = sid_example_to_arrays(
        {"image": _img(3, 32), "label": 2, "mask": m}, 32)
    assert out["mask"][:8].min() == 1.0
    assert out["mask"][8:].max() == 0.0


def test_collate_normalization_matches_processor():
    # the reference collate does /255 then (x-mean)/std with the SigLIP
    # processor stats (0.5, 0.5) — siglip2siddataset.py:924-938
    out = sid_example_to_arrays({"image": _img(4), "label": 1}, 32)
    x = normalize_siglip(jnp.asarray(out["pixels"]))
    want = (out["pixels"].astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(np.asarray(x), want, atol=1e-6)
    assert float(jnp.min(x)) >= -1.0 and float(jnp.max(x)) <= 1.0


def test_label_names_roundtrip():
    for i, name in enumerate(SID_LABELS):
        a = sid_example_to_arrays({"image": _img(5, 32), "label": name}, 32)
        b = sid_example_to_arrays({"image": _img(5, 32), "label": i}, 32)
        assert a["cls"] == b["cls"] == i
        assert a["binary"] == b["binary"] == float(i > 0)


def test_live_schema_variants():
    """Hardening for the real dataset's known encodings (r3 verdict item
    9): spelling/case label drift, {bytes}/{path} image dicts, 0-1-valued
    float masks, undecodable masks → reference's zero-mask fallback
    (siglip2siddataset.py:871-907)."""
    import io

    from PIL import Image

    from tpudf.data.datasets import sid_example_to_arrays, sid_label_to_index

    # label variants: ints pass through; else-branch strings → tampered
    assert sid_label_to_index("Real ") == 0
    assert sid_label_to_index("full_synthetic") == 1
    assert sid_label_to_index("FULLY_SYNTHETIC") == 1
    assert sid_label_to_index("splice_edit") == 2       # unknown → tampered
    assert sid_label_to_index(np.int64(1)) == 1

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 256, (40, 48, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")

    # bytes-dict image + 0/1-valued float mask
    mask01 = (rng.random((40, 48)) > 0.6).astype(np.float32)
    out = sid_example_to_arrays(
        {"image": {"bytes": buf.getvalue(), "path": None},
         "label": "tampered", "mask": mask01}, 32)
    assert out["pixels"].shape == (32, 32, 3)
    assert out["cls"] == 2 and out["has_mask"]
    assert 0.1 < out["mask"].mean() < 0.8   # not all-zero (old >127 bug)

    # undecodable mask → zero mask, has_mask False (reference fallback)
    out = sid_example_to_arrays(
        {"image": img, "label": 1, "mask": {"bogus": True}}, 32)
    assert not out["has_mask"] and out["mask"].sum() == 0.0


@pytest.mark.network
@pytest.mark.skipif(os.environ.get("TPUDF_NETWORK_TESTS") != "1",
                    reason="live HF pull; set TPUDF_NETWORK_TESTS=1")
def test_live_sid_set_first_examples():
    """First networked run is a test, not a debugging session: pull a few
    live SID_Set examples and push them through the array mapping
    (ref siglip2siddataset.py:943)."""
    from tpudf.data.datasets import load_sid_set, sid_example_to_arrays
    ds = load_sid_set("validation", subset=":8")
    n_mask = 0
    for ex in ds:
        out = sid_example_to_arrays(ex, 64)
        assert out["pixels"].shape == (64, 64, 3)
        assert out["cls"] in (0, 1, 2)
        assert out["mask"].shape == (64, 64)
        n_mask += int(out["has_mask"])
        assert out["has_mask"] == (out["cls"] == 2) or out["cls"] != 2
