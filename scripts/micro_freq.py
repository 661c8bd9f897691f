"""Sub-component timing of the 24-d freq battery at B=256 (long-chain slope).

Rows: dft (two einsums), fft15 (full fft_features), srm, haar, entropy-only,
regions-only — identifies the HBM-bound passes worth fusing into a Pallas
reduction kernel.
"""
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [os.path.dirname(_here), _here]

import jax
import jax.numpy as jnp
import numpy as np

from _slope import slope  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpudf.ops.dwt import haar_energies_2level  # noqa: E402
from tpudf.ops.fft_features import (_static_masks, extract_freq_vector,  # noqa: E402
                                    fft2_shifted_matmul, fft_features)
from tpudf.ops.srm import srm_features  # noqa: E402

B = 256
H = W = 256


def main():
    key = jax.random.key(0)
    gray = jax.random.uniform(key, (B, H, W), jnp.float32)

    mask, binm = [jnp.asarray(a) for a in _static_masks(H, W)[:2]]

    def dft(g):
        re, im = fft2_shifted_matmul(g)
        return re[:, 0, 0] + im[:, 0, 0]

    def entropy_only(g):
        # times the 49 boundary compare+sum passes only; the hist/prob/log
        # tail of the real feature (fft_features.py:215-220) is (B, 50)-
        # shaped and intentionally excluded as negligible

        re, im = fft2_shifted_matmul(g)
        phase = jnp.arctan2(im, re).reshape(B, H * W)
        nb = 50
        bounds = (np.arange(1, nb) / nb) * (2 * np.pi) - np.pi
        n_ge = jnp.stack(
            [jnp.sum((phase >= bk).astype(jnp.float32), axis=1)
             for bk in bounds.astype(np.float32)], axis=1)
        return jnp.sum(n_ge, axis=1)

    def regions_only(g):
        re, im = fft2_shifted_matmul(g)
        magsq = (re * re + im * im).reshape(B, H * W)
        mag = jnp.sqrt(magsq)
        logmag = 0.5 * jnp.log(magsq + 2e-6 * mag + 1e-12)
        mm = jnp.bfloat16
        s1 = jnp.einsum("bn,nk->bk", mag.astype(mm), mask.astype(mm),
                        preferred_element_type=jnp.float32)
        s2 = jnp.einsum("bn,nk->bk", logmag.astype(mm), binm.astype(mm),
                        preferred_element_type=jnp.float32)
        return jnp.sum(s1, 1) + jnp.sum(s2, 1) + jnp.sum(mag, 1)

    rows = [
        ("full24", lambda g: extract_freq_vector(g)),
        ("fft15", lambda g: fft_features(g)),
        ("dft", dft),
        ("regions", regions_only),
        ("entropy", entropy_only),
        ("haar", lambda g: haar_energies_2level(g)),
        ("srm", lambda g: srm_features(g)),
    ]
    for name, f in rows:
        dt = slope(f, gray, lo=4, hi=16, reps=5)
        print(f"{name:8s} {dt * 1e3:7.3f} ms/batch")


if __name__ == "__main__":
    main()
