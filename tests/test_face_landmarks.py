"""Face landmark net + landmark-driven drift signals.

The r3 'done' criterion: a swapped-face fixture clip must drive the face
trio (topology / embedding / track drift) above threshold via LANDMARKS,
not box geometry — the swap keeps the face box static and only changes the
facial geometry/appearance.
"""

import numpy as np
import pytest
import jax

from tpudf.data.synth_faces import face_clip, make_batch, random_identity
from tpudf.models.face_landmark import landmark_forward, train_landmark_net


@pytest.fixture(scope="module")
def lm_params():
    # short but sufficient budget (~1px MAE needs ~600 steps; CI uses 500)
    return train_landmark_net(steps=500, batch=64, size=64, seed=0)


def test_landmark_accuracy(lm_params):
    rng = np.random.default_rng(123)
    imgs, pres, lms, boxes = make_batch(rng, 64, 64, p_face=1.0)
    out = landmark_forward(lm_params, imgs)
    mae_px = float(np.mean(np.abs(np.asarray(out["landmarks"]) - lms))) * 64
    assert mae_px < 2.5, mae_px
    # presence separates faces from backgrounds
    imgs2, pres2, _, _ = make_batch(rng, 64, 64, p_face=0.5)
    pred = np.asarray(landmark_forward(lm_params, imgs2)["presence"]) > 0
    assert float(np.mean(pred == (pres2 > 0.5))) > 0.9


def test_detect_landmarks_batch_pixels(lm_params):
    from tpudf.serve.face import detect_landmarks_batch
    rng = np.random.default_rng(7)
    frames, true_lms = face_clip(128, 4, rng)
    lms, boxes = detect_landmarks_batch(frames, lm_params)
    assert sum(l is not None for l in lms) >= 3
    errs = [np.mean(np.abs(l - t * 128)) for l, t in zip(lms, true_lms)
            if l is not None]
    assert np.mean(errs) < 8.0, errs       # pixels at 128px


def test_swapped_face_drives_trio_via_landmarks(lm_params):
    """THE fixture: identity swap mid-clip with a STATIC face box. Box
    geometry cannot see it; landmarks + aligned-crop embeddings must.
    The identity pair has clearly different facial geometry (as a real
    face swap does); both clips share motion + rendering noise."""
    from tpudf.data.synth_faces import FaceIdentity
    from tpudf.serve.face import (face_embedding_drift, face_topology_drift,
                                  face_track_drift)
    id_a = FaceIdentity(eye_dx=0.23, eye_y=0.38, eye_r=0.06, nose_y=0.58,
                        mouth_y=0.74, mouth_w=0.17, face_aspect=1.2,
                        skin=np.asarray([0.85, 0.65, 0.55]),
                        lip=np.asarray([0.75, 0.3, 0.3]), eye_dark=0.1)
    id_b = FaceIdentity(eye_dx=0.33, eye_y=0.45, eye_r=0.08, nose_y=0.63,
                        mouth_y=0.79, mouth_w=0.27, face_aspect=1.42,
                        skin=np.asarray([0.6, 0.45, 0.35]),
                        lip=np.asarray([0.55, 0.2, 0.2]), eye_dark=0.3)
    rng = np.random.default_rng(11)
    stable, _ = face_clip(128, 6, rng, swap_at=None, jitter=0.0,
                          id_a=id_a, id_b=id_b)
    rng = np.random.default_rng(11)
    swapped, _ = face_clip(128, 6, rng, swap_at=3, jitter=0.0,
                           id_a=id_a, id_b=id_b)

    def embed_fn(batch):
        """Deterministic toy embedding: channel-wise spatial moments —
        enough to distinguish identities (skin/lip colors, geometry)."""
        x = batch.astype(np.float32) / 255.0
        feats = [x.mean((1, 2)), x.std((1, 2)),
                 x[:, :56].mean((1, 2)), x[:, 56:].mean((1, 2))]
        e = np.concatenate(feats, axis=1)
        return e / (np.linalg.norm(e, axis=1, keepdims=True) + 1e-6)

    topo_stable = face_topology_drift(list(stable), lm_params=lm_params)
    topo_swap = face_topology_drift(list(swapped), lm_params=lm_params)
    assert topo_stable is not None and topo_swap is not None
    assert topo_swap > topo_stable
    assert topo_swap > 0.10, topo_swap

    emb_stable = face_embedding_drift(list(stable), embed_fn,
                                      lm_params=lm_params)
    emb_swap = face_embedding_drift(list(swapped), embed_fn,
                                    lm_params=lm_params)
    assert emb_swap is not None and emb_swap > (emb_stable or 0.0)

    trk_swap = face_track_drift(list(swapped), embed_fn,
                                lm_params=lm_params)
    trk_stable = face_track_drift(list(stable), embed_fn,
                                  lm_params=lm_params)
    assert trk_swap is not None and trk_swap > (trk_stable or 0.0)


def test_save_load_roundtrip(lm_params, tmp_path):
    from tpudf.models.face_landmark import (load_landmark_net,
                                            save_landmark_net)
    p = str(tmp_path / "lm.npz")
    save_landmark_net(lm_params, p)
    loaded = load_landmark_net(p)
    rng = np.random.default_rng(5)
    imgs, _, _, _ = make_batch(rng, 8, 64, p_face=1.0)
    a = landmark_forward(lm_params, imgs)["landmarks"]
    b = landmark_forward(loaded, imgs)["landmarks"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_haar_fallback_still_works():
    """lm_params=None must keep the r2 behavior (Haar/None paths)."""
    from tpudf.serve.face import face_topology_drift
    rng = np.random.default_rng(3)
    frames, _ = face_clip(64, 4, rng)
    # Haar likely finds nothing on synthetic cartoons → None is acceptable;
    # the call just must not raise
    out = face_topology_drift(list(frames), lm_params=None)
    assert out is None or 0.0 <= out <= 1.0
