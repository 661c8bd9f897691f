"""Orbax checkpoint + safetensors head export roundtrip tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_orbax_roundtrip(tmp_path):
    from tpudf.train.checkpoint import (load_metrics, restore_checkpoint,
                                        save_checkpoint)
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3),
                        "b": jnp.zeros(3)},
             "step": jnp.asarray(7)}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, metrics={"f1": 0.91, "epoch": 3})
    like = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(path, like)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert int(restored["step"]) == 7
    m = load_metrics(path)
    assert m["f1"] == 0.91


def test_safetensors_head_roundtrip(tmp_path):
    from safetensors.numpy import load_file
    from tpudf.train.checkpoint import save_head_safetensors
    params = {"fc1": {"w": np.ones((4, 2), np.float32),
                      "b": np.zeros(2, np.float32)},
              "blocks": [{"g": np.full(3, 2.0, np.float32)}]}
    p = str(tmp_path / "head.safetensors")
    save_head_safetensors(p, params)
    sd = load_file(p)
    assert set(sd) == {"fc1.w", "fc1.b", "blocks.0.g"}
    np.testing.assert_array_equal(sd["blocks.0.g"], np.full(3, 2.0))


def test_freq_mlp_v5_safetensors_roundtrip(tmp_path):
    """Export a v5 params tree in the trainer's artifact layout and reload."""
    from safetensors.numpy import save_file
    from tpudf.models.freq_mlp import (apply_freq_mlp_v5,
                                       freq_mlp_v5_from_safetensors,
                                       init_freq_mlp_v5)
    p0 = init_freq_mlp_v5(jax.random.key(0))
    sd = {"normer.mean": np.asarray(p0["norm_mean"]),
          "normer.std": np.asarray(p0["norm_std"]),
          "contrast.alpha": np.asarray(p0["contrast"]["alpha"]),
          "contrast.beta": np.asarray(p0["contrast"]["beta"]),
          "band.gates": np.asarray(p0["gates"]),
          "head.weight": np.ascontiguousarray(np.asarray(p0["head"]["w"]).T),
          "head.bias": np.asarray(p0["head"]["b"]),
          "temp.T": np.asarray(p0["temp"]).reshape(1)}
    for i, blk in enumerate(p0["blocks"]):
        sd[f"blocks.{i}.norm.weight"] = np.asarray(blk["ln"]["scale"])
        sd[f"blocks.{i}.norm.bias"] = np.asarray(blk["ln"]["bias"])
        sd[f"blocks.{i}.fc1.weight"] = np.ascontiguousarray(np.asarray(blk["fc1"]["w"]).T)
        sd[f"blocks.{i}.fc1.bias"] = np.asarray(blk["fc1"]["b"])
        sd[f"blocks.{i}.fc2.weight"] = np.ascontiguousarray(np.asarray(blk["fc2"]["w"]).T)
        sd[f"blocks.{i}.fc2.bias"] = np.asarray(blk["fc2"]["b"])
    path = str(tmp_path / "freq_v5.safetensors")
    save_file(sd, path)
    p1 = freq_mlp_v5_from_safetensors(path)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((5, 24)), jnp.float32)
    np.testing.assert_allclose(np.asarray(apply_freq_mlp_v5(p0, x)),
                               np.asarray(apply_freq_mlp_v5(p1, x)),
                               atol=1e-6)
