"""Component ablation of the deployed detect-core bench graph (B=256).

Rows (long-chain slope timing, scripts/devtime.py methodology):
  full     the exact bench.py graph (tower+head+freq+fusion+CORAL)
  tower    int8+ToMe tower + binary head only
  freq     grayscale + 24-d freq battery + freq MLP only
  tail     fusion linear + CORAL blend on precomputed logits

Identifies where the non-tower ~3-4 ms/batch goes so the next perf lever
targets the right component.
"""
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [os.path.dirname(_here), _here]

import jax
import jax.numpy as jnp

from _slope import slope  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import entry  # noqa: E402
from tpudf.calib.coral import CoralCutpoints, coral_blend  # noqa: E402
from tpudf.core.precision import DEFAULT_POLICY  # noqa: E402
from tpudf.models.freq_mlp import apply_freq_mlp  # noqa: E402
from tpudf.models.fusion import apply_fusion_linear  # noqa: E402
from tpudf.models.heads import apply_binary_head  # noqa: E402
from tpudf.models.siglip import CONFIGS  # noqa: E402
from tpudf.models.siglip import siglip_forward  # noqa: E402
from tpudf.ops.fft_features import extract_freq_vector  # noqa: E402
from tpudf.ops.tome import DEPLOYED_TOME_R, deployed_floor  # noqa: E402

B = 256


def main():
    cfg = CONFIGS["base-256"]
    fn, args = entry()
    backbone, head, freq, fusion, pixels = args
    reps = B // int(pixels.shape[0])
    px = jnp.tile(pixels, (reps, 1, 1, 1))
    cuts = CoralCutpoints.default()
    tome_floor = deployed_floor((cfg.image_size // cfg.patch_size) ** 2)

    def full(p):
        out = fn(backbone, head, freq, fusion, p)
        return out["p_blend"]

    def tower(p):
        norm = (p.astype(jnp.bfloat16) - 0.5) / 0.5
        feats = siglip_forward(backbone, norm, cfg, DEFAULT_POLICY,
                               tome_r=DEPLOYED_TOME_R,
                               tome_floor=tome_floor)["pooled"]
        return apply_binary_head(head, feats)

    def freq_only(p):
        gray = jnp.einsum("bhwc,c->bhw", p.astype(jnp.bfloat16),
                          jnp.asarray([0.299, 0.587, 0.114], jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        return apply_freq_mlp(freq, extract_freq_vector(gray))

    z = jnp.zeros((B,), jnp.float32)

    def tail(zz):
        p_sig = jax.nn.sigmoid(zz)
        return coral_blend(apply_fusion_linear(fusion, p_sig, p_sig),
                           cuts)["p_blend"]

    for name, f, x in [("full", full, px), ("tower", tower, px),
                       ("freq", freq_only, px), ("tail", tail, z)]:
        dt = slope(f, x, lo=4, hi=16, reps=5)
        print(f"{name:8s} {dt * 1e3:8.2f} ms/batch   "
              f"{B / dt:10.0f} img/s")


if __name__ == "__main__":
    main()
