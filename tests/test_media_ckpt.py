"""Media guards + checkpoint-filtering tests."""

import numpy as np
import pytest
from PIL import Image

from tpudf.data.media import (MediaError, is_near_constant, load_image_any,
                              validate_image)
from tpudf.train.checkpoint import (detect_feature_dim, load_state_filtered)


def test_load_image_guards(tmp_path):
    p = str(tmp_path / "small.png")
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(p)
    with pytest.raises(MediaError):
        load_image_any(p)

    p2 = str(tmp_path / "wide.png")
    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((100, 4000, 3)) * 255)
                    .astype(np.uint8)).save(p2)
    arr = load_image_any(p2)
    assert max(arr.shape[:2]) <= 2048


def test_near_constant_rejection():
    assert is_near_constant(np.full((32, 32, 3), 128, np.uint8))
    assert not is_near_constant(
        (np.random.default_rng(0).random((32, 32, 3)) * 255)
        .astype(np.uint8))
    with pytest.raises(MediaError):
        validate_image(np.full((32, 32, 3), 7, np.uint8))


def test_load_state_filtered_shape_mismatch():
    template = {"a": {"w": np.zeros((4, 4)), "b": np.zeros(4)},
                "c": np.zeros(2)}
    sd = {"a": {"w": np.ones((4, 4)), "b": np.ones(8)}}   # b mismatched, c missing
    logs = []
    out = load_state_filtered(sd, template, log_fn=logs.append)
    np.testing.assert_array_equal(out["a"]["w"], np.ones((4, 4)))
    np.testing.assert_array_equal(out["a"]["b"], np.zeros(4))  # kept init
    np.testing.assert_array_equal(out["c"], np.zeros(2))
    assert any("mismatch" in l for l in logs)
    assert any("missing" in l for l in logs)


def test_detect_feature_dim():
    sd = {"fc1": {"w": np.zeros((1024, 512))}}
    assert detect_feature_dim(sd) == 1024
    assert detect_feature_dim({"x": np.zeros(3)}) is None


def test_adafactor_option():
    import optax
    from tpudf.train.steps import make_optimizer
    opt = make_optimizer(kind="adafactor", total_steps=10)
    params = {"w": np.zeros((8, 8), np.float32)}
    state = opt.init(params)   # should not allocate full second moments
    assert state is not None
