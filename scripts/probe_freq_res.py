"""Reduced-resolution frequency battery probe (r4 verdict next #2).

The 24-d FFT/SRM battery runs at the reference-pinned 256x256
(appv3.py:1634). This probe measures, on the chip:
  1. battery time at 256 vs 192 vs 128 input (area-downsampled gray);
  2. per-dimension feature drift (correlation + max abs delta of the
     standardized 24-d vectors) on structured images;
  3. end-task AUC: a freq MLP trained on 256-res features, evaluated on
     256 (reference) vs the reduced-res features (mismatched), plus a
     matched retrain — the same deploy-or-reject instrument the ToMe
     r=96 promotion used (scripts/cert_geometry.py).

Run: python scripts/probe_freq_res.py
"""
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [os.path.dirname(_here), _here]

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

from _slope import slope  # noqa: E402
from tpudf.data.synth_detect import make_detect_batch  # noqa: E402
from tpudf.eval.metrics import roc_auc  # noqa: E402
from tpudf.models.freq_mlp import apply_freq_mlp, init_freq_mlp  # noqa: E402
from tpudf.ops.fft_features import extract_freq_vector  # noqa: E402

B = 256


def gray_of(imgs_uint8):
    x = jnp.asarray(imgs_uint8, jnp.float32) / 255.0
    return jnp.einsum("bhwc,c->bhw", x,
                      jnp.asarray([0.299, 0.587, 0.114], jnp.float32))


def downsample(gray, res):
    b, h, w = gray.shape
    f = h // res
    if res * f == h:                       # integer area pooling
        return gray.reshape(b, res, f, res, f).mean((2, 4))
    return jax.image.resize(gray, (b, res, res), "linear")


def feats_at(gray, res):
    g = gray if res == gray.shape[1] else downsample(gray, res)
    return np.asarray(jax.jit(extract_freq_vector)(g))


def train_freq(feats, labels, seed=0, steps=500):
    params = init_freq_mlp(jax.random.key(seed))
    opt = optax.adam(3e-3)
    state = opt.init(params)
    x, y = jnp.asarray(feats), jnp.asarray(labels)

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            z = apply_freq_mlp(pp, x, noise_rng=None)
            return jnp.mean(optax.sigmoid_binary_cross_entropy(z, y))
        l, g = jax.value_and_grad(loss_fn)(p)
        up, s2 = opt.update(g, s)
        return optax.apply_updates(p, up), s2, l

    for _ in range(steps):
        params, state, _ = step(params, state)
    return params


def auc_with(params, feats, labels):
    z = np.asarray(apply_freq_mlp(params, jnp.asarray(feats)))
    return roc_auc(labels, z)


def main():
    rng = np.random.default_rng(0)

    # ---- timing
    gray = jnp.asarray(rng.random((B, 256, 256), np.float32))
    for res in (256, 128, 64):
        def f(g):
            gg = g if res == 256 else downsample(g, res)
            return extract_freq_vector(gg)
        dt = slope(f, gray, lo=4, hi=16, reps=5)
        print(f"battery@{res}: {dt * 1e3:6.2f} ms/256-batch")

    # ---- feature drift on structured images
    imgs, y = make_detect_batch(256, 256, seed=0, artifact_amp=0.06)
    g = gray_of(imgs)
    f256 = feats_at(g, 256)
    for res in (128, 64):
        fr = feats_at(g, res)
        corr = [np.corrcoef(f256[:, d], fr[:, d])[0, 1] for d in range(24)]
        print(f"drift@{res}: per-dim corr min {np.min(corr):.3f} "
              f"mean {np.mean(corr):.3f}; max|delta| "
              f"{np.max(np.abs(f256 - fr)):.3f} "
              f"mean|delta| {np.mean(np.abs(f256 - fr)):.3f}")

    # ---- end-task: freq expert alone on checkerboard/grid discrimination
    tr_imgs, tr_y = make_detect_batch(512, 256, seed=1, artifact_amp=0.06)
    va_imgs, va_y = make_detect_batch(256, 256, seed=2, artifact_amp=0.06)
    gtr, gva = gray_of(tr_imgs), gray_of(va_imgs)
    tr256, va256 = feats_at(gtr, 256), feats_at(gva, 256)
    params = train_freq(tr256, tr_y)
    auc_ref = auc_with(params, va256, va_y)
    print(f"freq-MLP AUC, 256-trained/256-eval: {auc_ref:.4f}")
    for res in (128, 64):
        va_r = feats_at(gva, res)
        a_mis = auc_with(params, va_r, va_y)
        tr_r = feats_at(gtr, res)
        p2 = train_freq(tr_r, tr_y)
        a_mat = auc_with(p2, va_r, va_y)
        print(f"  @{res}: mismatched {a_mis:.4f} (d {a_mis - auc_ref:+.4f})"
              f"  matched {a_mat:.4f} (d {a_mat - auc_ref:+.4f})")


if __name__ == "__main__":
    main()
