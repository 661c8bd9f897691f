"""Face identity embedding (models/face_embed.py) — the ArcFace-metric
analogue (appv3.py:67-90, :3557-3755; r3 verdict item 4).

The done-criterion fixture: a MID-CLIP IDENTITY SWAP must fire
face_embedding_drift while a mid-clip RELIGHT (the nuisance an identity
metric must ignore) must not — and the identity net's swap-vs-relight
margin must beat the tower-embedding substitute on the same fixture."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpudf.data.synth_faces import face_clip, random_identity
from tpudf.models.face_embed import (face_embed_forward, load_face_embed,
                                     save_face_embed, train_face_embed)
from tpudf.serve.face import (ID_DRIFT_LO, ID_DRIFT_SPAN,
                              face_crop_from_landmarks,
                              face_temporal_signals, get_face_embed_params,
                              identity_embed_crops)

_ASSET = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tpudf", "assets", "face_embed.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(_ASSET), reason="packaged face_embed asset missing")


@pytest.fixture(scope="module")
def id_params():
    return load_face_embed(_ASSET)


def _relight_step(frames, strength=0.5):
    h, w = frames[0].shape[:2]
    ramp = (np.mgrid[0:h, 0:w][1] / w).astype(np.float32)
    out = []
    for i, f in enumerate(frames):
        g = f.astype(np.float32) / 255.0
        if i >= len(frames) // 2:
            g = np.clip(g * (1.0 + strength * (ramp[..., None] - 0.3)),
                        0, 1)
        out.append((g * 255).astype(np.uint8))
    return np.stack(out)


def _crops(frames, lms):
    return np.stack([face_crop_from_landmarks(f, l * f.shape[0],
                                              out_size=112)
                     for f, l in zip(frames, lms)])


def _drift(emb):
    emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-6)
    return 1.0 - float(np.mean(np.sum(emb[:-1] * emb[1:], axis=1)))


def _id_vec(ident):
    return np.asarray([ident.eye_dx, ident.eye_y, ident.mouth_w,
                       ident.face_aspect / 3, *ident.skin, *ident.lip])


def _distinct_ids(rng, min_dist=0.35):
    """Sample a clearly-distinct identity pair — a swap to a near-twin is
    legitimately hard and not what the fixture tests (real face swaps
    replace the identity, appv3.py:3557)."""
    a = random_identity(rng)
    for _ in range(50):
        b = random_identity(rng)
        if np.linalg.norm(_id_vec(a) - _id_vec(b)) >= min_dist:
            return a, b
    return a, b


def test_same_identity_clusters(id_params):
    """Two views of one identity are closer than views across identities
    (the contrastive objective, averaged over several identities)."""
    from tpudf.models.face_embed import make_pair_batch
    rng = np.random.default_rng(0)
    k = 12
    batch = make_pair_batch(rng, k)
    emb = np.asarray(face_embed_forward(id_params, jnp.asarray(batch)))
    pos = np.mean(np.sum(emb[:k] * emb[k:], axis=1))
    neg = np.mean(emb[:k] @ emb[k:].T) - pos / k  # off-diagonal mean
    assert pos > neg + 0.3, (pos, neg)


def test_swap_fires_relight_does_not(id_params):
    """THE fixture (r3 verdict): swap drives the drift score high, a step
    relight of the same clip stays low, across trials."""
    rng = np.random.default_rng(1)
    scores = {"relight": [], "swap": []}
    for _ in range(6):
        ia, ib = _distinct_ids(rng)
        stable, lms = face_clip(128, 6, rng, jitter=0.01, id_a=ia)
        swapped, lms2 = face_clip(128, 6, rng, swap_at=3, jitter=0.01,
                                  id_a=ia, id_b=ib)
        for key, (fr, lm) in (("relight", (_relight_step(stable), lms)),
                              ("swap", (swapped, lms2))):
            d = _drift(identity_embed_crops(id_params, _crops(fr, lm)))
            scores[key].append(
                float(np.clip((d - ID_DRIFT_LO) / ID_DRIFT_SPAN, 0, 1)))
    assert np.mean(scores["swap"]) > 0.5, scores
    assert np.mean(scores["relight"]) < 0.3, scores
    assert min(scores["swap"]) > max(scores["relight"]) - 0.15, scores


def test_identity_margin_beats_tower_substitute(id_params):
    """Swap-vs-relight margin: identity net > tower embedding of the same
    crops (the pre-r4 substitute; random-init small tower as proxy — no
    pretrained SigLIP exists in this egress-free environment, relative
    margins are the claim)."""
    from tpudf.core.precision import F32_POLICY
    from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward
    cfg = CONFIGS["test-64"]
    tower = init_siglip(jax.random.key(0), cfg)

    def tower_embed(crops):
        x = jnp.asarray(crops, jnp.float32) / 255.0
        x = jax.image.resize(x, (x.shape[0], 64, 64, 3), "bilinear")
        return np.asarray(siglip_forward(tower, (x - 0.5) / 0.5, cfg,
                                         F32_POLICY)["pooled"])

    rng = np.random.default_rng(2)
    drifts = {"id": {"relight": [], "swap": []},
              "tower": {"relight": [], "swap": []}}
    for _ in range(6):
        ia, ib = _distinct_ids(rng)
        stable, lms = face_clip(128, 6, rng, jitter=0.01, id_a=ia)
        swapped, lms2 = face_clip(128, 6, rng, swap_at=3, jitter=0.01,
                                  id_a=ia, id_b=ib)
        for key, (fr, lm) in (("relight", (_relight_step(stable), lms)),
                              ("swap", (swapped, lms2))):
            c = _crops(fr, lm)
            drifts["id"][key].append(
                _drift(identity_embed_crops(id_params, c)))
            drifts["tower"][key].append(_drift(tower_embed(c)))

    def margin(d):
        # normalized: swap/relight separation in units of the relight level
        r, s = np.mean(d["relight"]), np.mean(d["swap"])
        return (s - r) / (r + 1e-6)

    m_id, m_tower = margin(drifts["id"]), margin(drifts["tower"])
    assert m_id > m_tower, (m_id, m_tower, drifts)


def test_face_temporal_signals_uses_identity_net(id_params, monkeypatch):
    """The serving path (face_temporal_signals) picks the identity net up
    from the packaged asset and must fire on a swap clip without any
    embed_fn; TPUDF_FACE_ID_EMBED=0 falls back to embed_fn."""
    monkeypatch.setenv("TPUDF_FACE_EMBED_CKPT", _ASSET)
    rng = np.random.default_rng(3)
    ia, ib = random_identity(rng), random_identity(rng)
    swapped, _ = face_clip(128, 6, rng, swap_at=3, jitter=0.0,
                           id_a=ia, id_b=ib)
    from tpudf.serve.face import get_landmark_params
    lm = get_landmark_params(allow_train=True)
    sigs = face_temporal_signals(list(swapped), None, lm_params=lm)
    assert sigs["face_embedding_drift"] is not None
    assert sigs["face_embedding_drift"] > 0.3, sigs

    calls = {}

    def embed_fn(batch):
        calls["tower"] = True
        return np.asarray(batch, np.float32).reshape(len(batch), -1)[:, :64]

    monkeypatch.setenv("TPUDF_FACE_ID_EMBED", "0")
    sigs2 = face_temporal_signals(list(swapped), embed_fn, lm_params=lm)
    assert calls.get("tower") and sigs2["face_embedding_drift"] is not None


def test_save_load_roundtrip(tmp_path):
    params = train_face_embed(steps=2, k_ids=4, n_ids=8, pool_views=2)
    p = str(tmp_path / "fe.npz")
    save_face_embed(params, p)
    loaded = load_face_embed(p)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_identity_dir_pool_and_training(tmp_path):
    """The CERTIFICATION.md §2 real-weights upgrade path must be
    executable: a folder of per-identity crops loads into the pool layout
    and trains through the same contrastive recipe (CLI --identity_dir)."""
    from PIL import Image

    from tpudf.models.face_embed import load_crop_pool_from_dir

    rng = np.random.default_rng(0)
    root = tmp_path / "ids"
    for ident in range(4):
        d = root / f"person_{ident}"
        d.mkdir(parents=True)
        base = rng.random((64, 64, 3))
        for v in range(3):
            img = np.clip(base + 0.05 * rng.standard_normal((64, 64, 3)),
                          0, 1)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                d / f"v{v}.png")
    # an identity with a single image must be skipped, not crash
    solo = root / "solo"
    solo.mkdir()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(solo / "a.png")

    pool = load_crop_pool_from_dir(str(root))
    assert pool.shape == (4, 3, 64, 64, 3)
    assert pool.dtype == np.float32 and pool.max() <= 1.0

    params = train_face_embed(steps=2, k_ids=8, pool=pool)
    emb = np.asarray(face_embed_forward(params, jnp.asarray(pool[:, 0])))
    assert emb.shape == (4, 128)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)
