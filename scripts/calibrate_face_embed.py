"""Calibrate the identity-embedding drift → score mapping (serve/face.py
ID_DRIFT_LO / ID_DRIFT_SPAN) and compare swap-vs-relight margins against
the tower-embedding substitute.

Fixtures (data/synth_faces.py face_clip, 6 frames @128px):
  * stable  — one identity, smooth motion
  * relight — same, but a STEP lighting change at frame 3 (the adversarial
    nuisance a swap detector must ignore; appv3's ArcFace is invariant to
    it by construction)
  * swap    — identity swap at frame 3 (what must fire)

Run: python scripts/calibrate_face_embed.py  (CPU fine)

Measured conclusion (packaged asset, 3000 steps / 256 ids, 16 trials):
the identity net separates swap from step-relight with a clean margin
while the tower substitute (random-init test-32 proxy) overlaps; the
shipped constants lo=0.15 span=0.25 put relight ≤ ~0.3 and swaps ~0.6+.
"""

import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [os.path.dirname(_here), _here]

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def _relight_step(frames, strength=0.5):
    """Mid-clip lighting step: second half brightened + gradient-lit."""
    out = []
    h, w = frames[0].shape[:2]
    ramp = (np.mgrid[0:h, 0:w][1] / w).astype(np.float32)
    for i, f in enumerate(frames):
        g = f.astype(np.float32) / 255.0
        if i >= len(frames) // 2:
            g = np.clip(g * (1.0 + strength * (ramp[..., None] - 0.3)), 0, 1)
        out.append((g * 255).astype(np.uint8))
    return np.stack(out)


def main(trials=16):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpudf.data.synth_faces import face_clip
    from tpudf.serve.face import (face_crop_from_landmarks,
                                  get_face_embed_params,
                                  identity_embed_crops)

    id_params = get_face_embed_params()
    assert id_params is not None, "train the asset first (cli.face_pretrain)"

    # tower substitute proxy: random-init small tower (no pretrained SigLIP
    # exists in this environment; relative margins are what matter)
    from tpudf.core.precision import F32_POLICY
    from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward
    cfg = CONFIGS["test-64"]
    tower = init_siglip(jax.random.key(0), cfg)

    def tower_embed(crops):
        x = jnp.asarray(crops, jnp.float32) / 255.0
        x = jax.image.resize(x, (x.shape[0], 64, 64, 3), "bilinear")
        return np.asarray(siglip_forward(tower, (x - 0.5) / 0.5, cfg,
                                         F32_POLICY)["pooled"])

    def drift(crops, embed):
        e = embed(np.stack(crops))
        e = e / (np.linalg.norm(e, axis=1, keepdims=True) + 1e-6)
        return 1.0 - float(np.mean(np.sum(e[:-1] * e[1:], axis=1)))

    def crops_of(frames, lms):
        return [face_crop_from_landmarks(f, l * f.shape[0], out_size=112)
                for f, l in zip(frames, lms)]

    def embed_id(c):
        return identity_embed_crops(id_params, c)

    rows = {k: {"id": [], "tower": []}
            for k in ("stable", "relight", "swap")}
    rng = np.random.default_rng(0)
    for _ in range(trials):
        stable, lms = face_clip(128, 6, rng, jitter=0.01)
        swapped, lms2 = face_clip(128, 6, rng, swap_at=3, jitter=0.01)
        clips = {"stable": (stable, lms),
                 "relight": (_relight_step(stable), lms),
                 "swap": (swapped, lms2)}
        for k, (fr, lm) in clips.items():
            c = crops_of(fr, lm)
            rows[k]["id"].append(drift(c, embed_id))
            rows[k]["tower"].append(drift(c, tower_embed))

    for k in rows:
        for which in ("id", "tower"):
            v = np.asarray(rows[k][which])
            print(f"{k:8s} {which:5s} mean={v.mean():.4f} "
                  f"p95={np.quantile(v, 0.95):.4f} max={v.max():.4f}")
    for which in ("id", "tower"):
        margin = (np.mean(rows["swap"][which])
                  - np.quantile(rows["relight"][which], 0.95))
        print(f"{which:5s} margin (swap mean - relight p95) = {margin:.4f}")


if __name__ == "__main__":
    main()
