"""Batched multi-expert detection engine.

The reference's image hot path issues ~28+ SERIAL ViT-L forwards per image
(SURVEY.md §3.1: 9 multicrops + rot view + flip-TTA re-run + 16 patch tiles
+ optional face crop, appv3.py:5117-5230). The TPU-native engine assembles
every view of every image in the batch into ONE padded device batch, runs a
single SigLIP forward + a single frequency-expert pass, and fuses/calibrates
the per-view logits back on device — this collapse is where the >=5x/chip
target is won (SURVEY.md §7 step 5).

View inventory per image (all device-side, data/pipeline.py):
  0..8     9 multicrops (center/halves/quadrants, ref appv3.py:3315-3350)
  9        rot90 dual view of the full image     (ref :3239-3247)
  10..18   h-flip multicrops (TTA)               (ref :5194-5212)
  19       rot90 of the flipped image
  20..35   4x4 patch-grid tiles                  (ref :3381-3462)
  36..51   rot90 duals of the patch tiles
  52       plain full image — embedding-anomaly reference view (ref :3494)
Total 53 views; one (B*53, S, S, 3) forward.

The 24-d frequency features are always extracted at 256px regardless of the
view size S — the reference pins its FFT/SRM extraction to a fixed 256
resize (appv3.py:1634), so base-384/so400m configs stay feature-compatible
with reference-trained FreqMLPs (and the FFTs cost 256^2, not S^2).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tpudf.calib.coral import (CoralCutpoints, coral_blend,
                               moe_fallback_blend)
from tpudf.core.precision import DEFAULT_POLICY, Policy
from tpudf.data.pipeline import (make_multicrops, make_patch_grid,
                                 normalize_siglip, rgb_to_gray, rot90_view)
from tpudf.models.freq_mlp import apply_freq_mlp
from tpudf.models.fusion import apply_fusion_linear
from tpudf.models.heads import apply_binary_head
from tpudf.models.siglip import SigLIPConfig, siglip_forward
from tpudf.ops.fft_features import extract_freq_vector

FREQ_TEMP = 1.25        # softens freq-MLP spikes (appv3.py:1162)
N_CROPS = 9
PATCH_GRID = 4


def _logit(p, eps=1e-6):
    p = jnp.clip(p, eps, 1 - eps)
    return jnp.log(p / (1 - p))


# Per-image scalar outputs are packed into one (B, K) array inside the jit
# graph: each host fetch of a separate leaf costs a full device round trip
# (~30 ms each through a tunneled chip — 15 leaves made the host wrapper 3x
# the graph time). _pack/_unpack keep the public dict interface unchanged
# (risk_idx comes back f32; every consumer casts with int()).
_PACK_KEY = "_packed_scalars"


def _pack(out: dict, names) -> dict:
    """Stack every (B,) output into one (B, K) f32 array. `names` is the
    static contract _unpack uses host-side; asserted here at trace time so
    the two can never drift."""
    scalars = sorted(k for k, v in out.items()
                     if hasattr(v, "ndim") and v.ndim == 1)
    assert tuple(scalars) == tuple(names), (scalars, names)
    rest = {k: v for k, v in out.items() if k not in scalars}
    rest[_PACK_KEY] = jnp.stack(
        [out[k].astype(jnp.float32) for k in scalars], axis=1)
    return rest


def _unpack(out: dict, names) -> dict:
    if _PACK_KEY not in out:
        return out
    packed = np.asarray(out.pop(_PACK_KEY))
    assert packed.shape[1] == len(names), (packed.shape, names)
    for i, k in enumerate(names):
        out[k] = packed[:, i]
    return out


# static contracts: the sorted (B,)-shaped keys of each detect fn's output
FULL_SCALARS = ("embed_l2", "entropy", "freq_prob", "max_patch", "p_blend",
                "p_fake_coral", "p_fake_raw", "patch_mean", "risk_idx",
                "visual_prob", "z_freq", "z_sig")
FAST_SCALARS = ("entropy", "freq_prob", "p_blend", "p_fake_coral",
                "p_fake_raw", "risk_idx", "visual_prob", "z_freq",
                "z_scaled", "z_sig")


@dataclasses.dataclass
class DetectEngine:
    """Holds params + compiled batched inference graphs."""
    cfg: SigLIPConfig
    backbone: Any
    head: Any
    freq: Any
    fusion: Any
    cuts: CoralCutpoints
    policy: Policy = DEFAULT_POLICY
    # optional artifacts (appv3.py parity):
    #   mean_real: (D,) cached mean-real embedding for the cosine term of
    #              the embedding anomaly (mean_real_embedding.npy, ref :3504)
    #   gbdt:      models.fusion.TreeEnsemble — XGBoost fusion override
    #              (+Platt) applied by serve/report.py (ref :5507-5578)
    #   bayes_calibration: fuse.bayesian.BayesCalibration — optional
    #              isotonic/logistic recalibration of bayesian_fuse_v2
    #              (appv3.py:948-975); load from bayes_calibration.json
    mean_real: Any = None
    gbdt: Any = None
    bayes_calibration: Any = None
    # ToMe token merging (ops/tome.py): merge tome_r most-similar token
    # pairs between consecutive tower blocks, never below tome_floor tokens
    # (0 → the tower's conservative S/4 default). Inference-only speed
    # mode — end-task AUC certified within tolerance of the float/
    # full-token model by tests/test_train_infer_e2e.py at the deployed
    # (DEPLOYED_TOME_R, deployed_floor) schedule.
    tome_r: int = 0
    tome_floor: int = 0
    # optional DEEPER ToMe schedule for the 32 patch-grid views of the
    # full-analysis path only (upscaled low-information tiles — see
    # _detect_batch); 0 = follow the main schedule
    patch_tome_r: int = 0
    patch_tome_floor: int = 0

    def __post_init__(self):
        self._detect = jax.jit(functools.partial(
            _detect_batch, cfg=self.cfg, policy=self.policy, cuts=self.cuts,
            tome_r=self.tome_r, tome_floor=self.tome_floor,
            patch_tome_r=self.patch_tome_r,
            patch_tome_floor=self.patch_tome_floor))
        self._detect_fast = jax.jit(functools.partial(
            _detect_batch_fast, cfg=self.cfg, policy=self.policy,
            cuts=self.cuts, tome_r=self.tome_r, tome_floor=self.tome_floor))

    def quantize(self, calib_uint8: np.ndarray | None = None):
        """Switch the backbone to the deployed W8A8 static-quant config
        (ops/quant.py): calibrate per-tensor activation scales on a batch of
        representative images (or synthetic noise if none given) and replace
        the float projection weights with int8. ~1.45x tower throughput on
        the v5e at pooled-feature cosine > 0.99 (tests/test_quant.py)."""
        from tpudf.ops.quant import (calibrate_siglip_act_scales,
                                     quantize_siglip_static)
        if "act_scales" in self.backbone.get("blocks", {}):
            return self
        if calib_uint8 is None:
            # per-tensor amax on noise need not bound real-image
            # activations — real inputs can then be clipped at quantization.
            # Callers with data available should pass a representative batch.
            print("[quantize][warn] calibrating activation scales on "
                  "synthetic noise — pass real images for reliable scales")
            s = self.cfg.image_size
            calib = np.random.default_rng(0).random((16, s, s, 3))
        else:
            calib = np.asarray(calib_uint8, np.float32) / 255.0
        norm = normalize_siglip(jnp.asarray(calib, jnp.float32))
        scales = calibrate_siglip_act_scales(self.backbone, self.cfg, norm,
                                             self.policy)
        self.backbone = quantize_siglip_static(self.backbone, scales,
                                               self.cfg)
        return self

    def dispatch_batch(self, pixels_uint8, fast: bool = False):
        """Launch the detect graph WITHOUT fetching: returns the on-device
        output dict immediately (JAX dispatch is asynchronous). Pair with
        fetch_batch() to finalize; predict_batch == fetch(dispatch). Serving
        uses the split so the blocking host round-trip happens once per
        batch, after all device work is enqueued (serve/report.py)."""
        fn = self._detect_fast if fast else self._detect
        return fn(self.backbone, self.head, self.freq, self.fusion,
                  jnp.asarray(pixels_uint8))

    @staticmethod
    def fetch_batch(dispatched, fast: bool = False) -> dict:
        """Blocking fetch + scalar unpack of a dispatch_batch() result."""
        return _unpack(jax.device_get(dispatched),
                       FAST_SCALARS if fast else FULL_SCALARS)

    def predict_batch(self, pixels_uint8: np.ndarray) -> dict:
        """Full-analysis path: multicrop + rot + flip TTA + patch grid.
        pixels_uint8: (B, S, S, 3) uint8 → dict of per-image signals
        (+ per-patch probabilities for the localization heatmap)."""
        return self.fetch_batch(self.dispatch_batch(pixels_uint8))

    def predict_batch_fast(self, pixels_uint8: np.ndarray) -> dict:
        """fast_mode (video frames, appv3.py:6409): single view + rot only."""
        return self.fetch_batch(self.dispatch_batch(pixels_uint8, fast=True),
                                fast=True)

    def embed_batch(self, pixels_uint8, pad: bool = True) -> np.ndarray:
        """L2-normalized pooled SigLIP features for (B, h, w, 3) uint8
        frames — ONE jitted tower forward (resize to the tower input size
        inside the graph) instead of eager per-op dispatch, which pays a
        host<->chip round trip per op through a tunneled runtime. The batch
        pads to a pow2 bucket so variable frame/crop counts compile at most
        log2(B)+1 graphs. Used by the video temporal path (identity drift,
        face embedding/track drift — appv3.py:3650-3755)."""
        px = np.asarray(pixels_uint8)
        b = px.shape[0]
        if pad:
            px = pad_to_bucket(px)
        fn = self.__dict__.get("_embed_fn")
        if fn is None:
            cfg, policy = self.cfg, self.policy

            def f(backbone, pixels):
                x = pixels.astype(jnp.float32) / 255.0
                s = cfg.image_size
                if x.shape[1] != s or x.shape[2] != s:
                    x = jax.image.resize(x, (x.shape[0], s, s, 3),
                                         "bilinear")
                feats = siglip_forward(backbone, normalize_siglip(x), cfg,
                                       policy)["pooled"].astype(jnp.float32)
                return feats / (jnp.linalg.norm(feats, axis=-1,
                                                keepdims=True) + 1e-6)

            fn = self.__dict__["_embed_fn"] = jax.jit(f)
        return np.asarray(jax.device_get(
            fn(self.backbone, jnp.asarray(px))))[:b]


def pad_to_bucket(pixels_uint8: np.ndarray, max_batch: int | None = None
                  ) -> np.ndarray:
    """Pad the batch dim up to the next power of two (capped at max_batch)
    by repeating the last image, so a serving workload compiles at most
    log2(max_batch)+1 device graphs instead of one per request count."""
    b = pixels_uint8.shape[0]
    bucket = 1 << max(0, (b - 1).bit_length())
    if max_batch is not None:
        bucket = min(bucket, max(max_batch, b))
    if bucket == b:
        return pixels_uint8
    pad = np.repeat(pixels_uint8[-1:], bucket - b, axis=0)
    return np.concatenate([pixels_uint8, pad], axis=0)


def _freq_gray(views_flat):
    """Grayscale at the reference's fixed 256px feature resolution
    (appv3.py:1634 resizes to 256 before FFT/SRM, independent of S)."""
    gray = rgb_to_gray(views_flat)
    n, s, _ = gray.shape
    if s != 256:
        gray = jax.image.resize(gray, (n, 256, 256), method="bilinear")
    return gray


def _experts(backbone, head, freq, views_flat, cfg, policy, tome_r=0,
             tome_floor=0):
    """One fused forward of both experts over (N, S, S, 3) [0,1] views."""
    feats = siglip_forward(backbone, normalize_siglip(views_flat), cfg,
                           policy, tome_r=tome_r, tome_floor=tome_floor
                           )["pooled"]
    z_sig = apply_binary_head(head, feats)
    fv = extract_freq_vector(_freq_gray(views_flat))
    z_freq = apply_freq_mlp(freq, fv)
    return z_sig, z_freq


def _core_from_views(z_sig_v, z_freq_v, z_rot, weights, fusion, cuts):
    """detect_core fusion math (appv3.py:3214-3302), batched over images.
    z_sig_v, z_freq_v: (B, 9); z_rot: (B,)."""
    z_sig = jnp.sum(z_sig_v * weights, axis=1)
    z_freq = jnp.sum(z_freq_v * weights, axis=1)
    base_prob = jax.nn.sigmoid(z_sig)
    rot_prob = jax.nn.sigmoid(z_rot)
    visual_prob = 0.6 * base_prob + 0.4 * rot_prob   # dual-view stabilizer
    z_sig = _logit(visual_prob)
    p_sig = visual_prob
    p_freq = jax.nn.sigmoid(z_freq / FREQ_TEMP)
    if fusion is None:
        # fusion-head artifact missing → "MoE fallback" parity
        # (deepfake-detector-v2/app.py:534, :1380-1390). The head-less
        # reference never defines the CORAL input; we feed it the mean
        # expert probability's logit (it only carries the capped 25% term).
        z_fused = _logit(0.5 * (p_sig + p_freq))
        out = coral_blend(z_fused, cuts)
        out["p_blend"] = moe_fallback_blend(p_sig, p_freq,
                                            out["p_fake_coral"])
    else:
        z_fused = apply_fusion_linear(fusion, p_sig, p_freq)
        out = coral_blend(z_fused, cuts)
    out.update({"z_sig": z_sig, "z_freq": z_freq,
                "visual_prob": p_sig, "freq_prob": p_freq})
    return out


def _detect_batch(backbone, head, freq, fusion, pixels, *, cfg, policy, cuts,
                  tome_r=0, tome_floor=0, patch_tome_r=0,
                  patch_tome_floor=0):
    """53-view full analysis. patch_tome_r/patch_tome_floor: optional
    DEEPER ToMe schedule for the 32 patch-grid views only — patch tiles
    are PATCH_GRID^2-fold upscaled crops (4x linear upsampling at the
    default grid), so their token redundancy is far higher than the main
    views'; merging them harder buys back most of their 60% share of the
    tower work at bounded patch-signal fidelity
    (tests/test_patch_tome.py, scripts/bench_full_analysis.py)."""
    b, s, _, _ = pixels.shape
    x = pixels.astype(jnp.float32) / 255.0

    crops, weights = make_multicrops(x)                 # (B, 9, S, S, 3)
    flip = jnp.flip(x, axis=2)
    crops_f, _ = make_multicrops(flip)
    patches = make_patch_grid(x, PATCH_GRID)            # (B, 16, S, S, 3)

    main_views = jnp.concatenate([
        crops,                                  # 0..8
        rot90_view(x)[:, None],                 # 9
        crops_f,                                # 10..18
        rot90_view(flip)[:, None],              # 19
        x[:, None],                             # 20 full image (embed view)
    ], axis=1)
    patch_views = jnp.concatenate([
        patches,                                # 0..15
        jnp.rot90(patches, k=1, axes=(2, 3)),   # 16..31 patch rot dual views
    ], axis=1)
    nm, np_ = main_views.shape[1], patch_views.shape[1]

    def fwd(v, r, fl):
        return siglip_forward(backbone, normalize_siglip(
            v.reshape(-1, s, s, 3)), cfg, policy, tome_r=r,
            tome_floor=fl)["pooled"]

    if patch_tome_r or patch_tome_floor:
        feats_main = fwd(main_views, tome_r, tome_floor)
        feats_patch = fwd(patch_views, patch_tome_r or tome_r,
                          patch_tome_floor or tome_floor)
    else:
        feats = fwd(jnp.concatenate([main_views, patch_views], axis=1),
                    tome_r, tome_floor)
        fr = feats.reshape(b, nm + np_, -1)
        feats_main = fr[:, :nm].reshape(b * nm, -1)
        feats_patch = fr[:, nm:].reshape(b * np_, -1)
    z_main = apply_binary_head(head, feats_main).reshape(b, nm)
    z_patchv = apply_binary_head(head, feats_patch).reshape(b, np_)

    # embedding-anomaly reference view: the plain full image's pooled
    # features, L2-normalized BEFORE the norm term exactly like
    # appv3.py:3497-3502 (f = f / ||f||, then L2 = ||f|| ≈ 1 → L2n ≈ 1/28);
    # the unnormalized norm would saturate min(1, l2/28) and inflate the
    # anomaly score (and GBDT feature 12) by ~0.58 vs the reference
    embed_feat = feats_main.reshape(b, nm, -1)[:, 20].astype(jnp.float32)
    embed_feat = embed_feat / (
        jnp.linalg.norm(embed_feat, axis=-1, keepdims=True) + 1e-6)
    embed_l2 = jnp.linalg.norm(embed_feat, axis=-1)

    # frequency expert only on views whose freq logits are consumed —
    # rot-dual views, the embed view and the patch rot duals feed nothing
    fviews = jnp.concatenate([crops, crops_f, patches], axis=1).reshape(
        b * 34, s, s, 3)
    fv = extract_freq_vector(_freq_gray(fviews))
    z_freq_used = apply_freq_mlp(freq, fv).reshape(b, 34)
    zf_main = z_freq_used[:, 0:9]
    zf_tta = z_freq_used[:, 9:18]
    zf_patch = z_freq_used[:, 18:34]

    main = _core_from_views(z_main[:, 0:9], zf_main, z_main[:, 9],
                            weights, fusion, cuts)
    tta = _core_from_views(z_main[:, 10:19], zf_tta, z_main[:, 19],
                           weights, fusion, cuts)

    # TTA mean fusion (appv3.py:5204-5212)
    p_blend = 0.5 * (main["p_blend"] + tta["p_blend"])
    p_raw = 0.5 * (main["p_fake_raw"] + tta["p_fake_raw"])
    p_coral = 0.5 * (main["p_fake_coral"] + tta["p_fake_coral"])

    # patch grid: single-view detect_core per tile with rot dual view
    # (appv3.py:3381-3462 via :3239-3247)
    zp = z_patchv[:, 0:16]
    zp_rot = z_patchv[:, 16:32]
    vp = 0.6 * jax.nn.sigmoid(zp) + 0.4 * jax.nn.sigmoid(zp_rot)
    fp = jax.nn.sigmoid(zf_patch / FREQ_TEMP)
    if fusion is None:                      # MoE fallback (see _core_from_views)
        pc = coral_blend(_logit(0.5 * (vp + fp)), cuts)
        patch_probs = moe_fallback_blend(vp, fp, pc["p_fake_coral"])
    else:
        z_patch = apply_fusion_linear(fusion, vp, fp)
        patch_probs = coral_blend(z_patch, cuts)["p_blend"]  # (B, 16)

    return _pack({
        "p_blend": p_blend,
        "p_fake_raw": p_raw,
        "p_fake_coral": p_coral,
        "risk_probs": main["risk_probs"],
        "risk_idx": main["risk_idx"],
        "entropy": main["entropy"],
        "visual_prob": main["visual_prob"],
        "freq_prob": main["freq_prob"],
        "z_sig": main["z_sig"],
        "z_freq": main["z_freq"],
        "patch_probs": patch_probs,
        "max_patch": jnp.max(patch_probs, axis=1),
        "patch_mean": jnp.mean(patch_probs, axis=1),
        "embed_l2": embed_l2,
        "embed_feat": embed_feat,
    }, FULL_SCALARS)


def _detect_batch_fast(backbone, head, freq, fusion, pixels, *, cfg, policy,
                       cuts, tome_r=0, tome_floor=0):
    """fast_mode: full view + rot dual view only (multicrop off)."""
    b, s, _, _ = pixels.shape
    x = pixels.astype(jnp.float32) / 255.0
    views = jnp.stack([x, rot90_view(x)], axis=1)
    z_sig, z_freq = _experts(backbone, head, freq,
                             views.reshape(b * 2, s, s, 3), cfg, policy,
                             tome_r, tome_floor)
    z_sig = z_sig.reshape(b, 2)
    z_freq = z_freq.reshape(b, 2)
    vprob = 0.6 * jax.nn.sigmoid(z_sig[:, 0]) + 0.4 * jax.nn.sigmoid(z_sig[:, 1])
    p_freq = jax.nn.sigmoid(z_freq[:, 0] / FREQ_TEMP)
    if fusion is None:                      # MoE fallback (see _core_from_views)
        z_fused = _logit(0.5 * (vprob + p_freq))
        out = coral_blend(z_fused, cuts)
        out["p_blend"] = moe_fallback_blend(vprob, p_freq,
                                            out["p_fake_coral"])
    else:
        z_fused = apply_fusion_linear(fusion, vprob, p_freq)
        out = coral_blend(z_fused, cuts)
    out.update({"visual_prob": vprob, "freq_prob": p_freq,
                "z_sig": _logit(vprob), "z_freq": z_freq[:, 0]})
    return _pack(out, FAST_SCALARS)
