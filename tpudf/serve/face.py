"""Face-region detection + escalation (host plugin).

The reference uses insightface (ONNXRuntime C++) for face detection /
landmarks / ArcFace embeddings (appv3.py:67-90, 3557-3755), gated on
availability. tpudf treats faces the same way — a host-side plugin:
  * detect_faces: OpenCV Haar cascade (bundled with cv2) → boxes
  * face_crop: largest face, margin-expanded square crop for the expert
    stack (appv3.py:5450-5452 face escalation path)
  * face_region_retouch_score: perlin + HF-flatness score of the face crop
    (appv3.py:2496-2503)
  * face_embedding_drift: SigLIP-embedding drift over per-frame face crops,
    the substitute for ArcFace drift (appv3.py:3557-3755 family)
Returns empty results when cv2 is unavailable.
"""

from __future__ import annotations

import numpy as np


def _cascade():
    try:
        import cv2
        path = cv2.data.haarcascades + "haarcascade_frontalface_default.xml"
        c = cv2.CascadeClassifier(path)
        return c if not c.empty() else None
    except Exception:
        return None


def detect_faces(image_rgb_uint8, min_size=48):
    """(H, W, 3) uint8 → list of (x, y, w, h) boxes."""
    c = _cascade()
    if c is None:
        return []
    import cv2
    gray = cv2.cvtColor(image_rgb_uint8, cv2.COLOR_RGB2GRAY)
    boxes = c.detectMultiScale(gray, scaleFactor=1.1, minNeighbors=5,
                               minSize=(min_size, min_size))
    return [tuple(int(v) for v in b) for b in boxes]


def face_crop(image_rgb_uint8, margin=0.25, out_size=None):
    """Largest-face square crop with margin; None if no face."""
    boxes = detect_faces(image_rgb_uint8)
    if not boxes:
        return None
    x, y, w, h = max(boxes, key=lambda b: b[2] * b[3])
    cx, cy = x + w / 2, y + h / 2
    s = max(w, h) * (1 + 2 * margin)
    H, W = image_rgb_uint8.shape[:2]
    x0 = int(np.clip(cx - s / 2, 0, W - 1))
    y0 = int(np.clip(cy - s / 2, 0, H - 1))
    x1 = int(np.clip(cx + s / 2, x0 + 1, W))
    y1 = int(np.clip(cy + s / 2, y0 + 1, H))
    crop = image_rgb_uint8[y0:y1, x0:x1]
    if out_size is not None:
        from PIL import Image
        crop = np.asarray(Image.fromarray(crop).resize(
            (out_size, out_size), Image.BICUBIC))
    return crop


def face_region_retouch_score(face_rgb_uint8):
    """0.5·perlin + 0.5·HF-flatness on the face crop (appv3.py:2496-2503)."""
    import jax.numpy as jnp
    from tpudf.ops.forensics import laplacian, perlin_diffusion_score
    x = jnp.asarray(face_rgb_uint8[None]).astype(jnp.float32) / 255.0
    # pad/crop to even dims for block ops
    perlin = float(perlin_diffusion_score(x)[0])
    w = jnp.asarray([0.299, 0.587, 0.114])
    gray = jnp.einsum("bhwc,c->bhw", x, w) * 255.0
    hf = float(jnp.var(laplacian(gray), axis=(1, 2))[0])
    hf_flat = float(np.clip(1 - hf / 200.0, 0.0, 1.0))
    return 0.5 * perlin + 0.5 * hf_flat


def _box_geometry_vec(box, frame_shape):
    """4-d geometry vector for a Haar face box — the landmark-free
    substitute for the reference's 5-point vector (appv3.py:3577-3593):
    [aspect ratio, relative center x, relative center y, relative size]."""
    x, y, w, h = box
    H, W = frame_shape[:2]
    return np.asarray([w / max(h, 1.0), (x + w / 2) / W, (y + h / 2) / H,
                       np.sqrt(w * h) / np.sqrt(H * W)], np.float32)


def face_topology_drift(frames_rgb_uint8):
    """Per-frame face-geometry drift (appv3.py:3557-3605). The reference
    normalizes 5-pt landmark distances by the bbox; the Haar substitute
    tracks the largest box's aspect/position/size vector. Same drift map:
    clip((mean ||v_t - v_{t+1}|| - 0.03) / 0.12, 0, 1). None if < 3 faces."""
    vecs = []
    for f in frames_rgb_uint8:
        boxes = detect_faces(np.asarray(f))
        if not boxes:
            continue
        box = max(boxes, key=lambda b: b[2] * b[3])
        vecs.append(_box_geometry_vec(box, np.asarray(f).shape))
    if len(vecs) < 3:
        return None
    diffs = [float(np.linalg.norm(vecs[i] - vecs[i + 1]))
             for i in range(len(vecs) - 1)]
    drift = float(np.mean(diffs))
    return float(np.clip((drift - 0.03) / 0.12, 0.0, 1.0))


def face_track_drift(frames_rgb_uint8, embed_fn):
    """Dominant-face track drift (appv3.py:3650-3755): 0.6 x embedding
    drift + 0.4 x geometry drift over IoU-tracked largest-face crops.
    Haar boxes carry no identity, so the track is greedy largest-box; the
    embedding stream uses `embed_fn` (the engine tower) on 112px crops."""
    geom, crops = [], []
    for f in frames_rgb_uint8:
        arr = np.asarray(f)
        boxes = detect_faces(arr)
        if not boxes:
            continue
        box = max(boxes, key=lambda b: b[2] * b[3])
        geom.append(_box_geometry_vec(box, arr.shape))
        c = face_crop(arr, out_size=112)
        if c is not None:
            crops.append(c)
    scores = []
    if len(crops) >= 3 and embed_fn is not None:
        emb = np.asarray(embed_fn(np.stack(crops)))
        emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-6)
        sims = np.sum(emb[:-1] * emb[1:], axis=1)
        drift = 1.0 - float(np.mean(sims))
        scores.append((float(np.clip((drift - 0.04) / 0.20, 0.0, 1.0)), 0.6))
    if len(geom) >= 3:
        diffs = [float(np.linalg.norm(geom[i] - geom[i + 1]))
                 for i in range(len(geom) - 1)]
        drift = float(np.mean(diffs))
        scores.append((float(np.clip((drift - 0.03) / 0.12, 0.0, 1.0)), 0.4))
    if not scores:
        return None
    tw = sum(w for _, w in scores)
    return float(sum(v * w for v, w in scores) / tw)


def face_embedding_drift(frames_rgb_uint8, embed_fn):
    """Per-frame face-crop embedding drift (ArcFace-drift substitute).
    embed_fn(batch_uint8 (N,S,S,3)) → (N, D) L2-normalized embeddings."""
    crops = []
    for f in frames_rgb_uint8:
        c = face_crop(f, out_size=112)
        if c is not None:
            crops.append(c)
    if len(crops) < 3:
        return None
    emb = np.asarray(embed_fn(np.stack(crops)))
    emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-6)
    sims = np.sum(emb[:-1] * emb[1:], axis=1)
    drift = 1.0 - float(np.mean(sims))
    return float(np.clip((drift - 0.05) / 0.40, 0.0, 1.0))
