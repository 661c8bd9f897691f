"""Face IDENTITY embedding network — the metric-learning stand-in for the
reference's ArcFace embeddings (appv3.py:67-90, consumed by the face
drift/track signals :3557-3755).

The r3 review flagged that SigLIP tower embeddings of aligned crops are
not identity-METRIC embeddings: the tower responds to lighting/texture as
much as identity, so face-swap drift sensitivity is diluted. This net is
trained contrastively on the procedural face generator
(data/synth_faces.py): positives are two renders of the SAME
FaceIdentity under different pose/scale/angle + identity-preserving
photometric augmentation (relighting, gamma, noise, color cast);
negatives are other identities in the batch (NT-Xent). The resulting
embedding is invariant to exactly the nuisances a mid-clip relight
introduces, while a mid-clip identity swap moves it far — the property
`face_embedding_drift` needs.

Pure-JAX param-dict style like models/face_landmark.py; deterministic
pretraining, .npz save/load, packaged asset via
`python -m tpudf.cli.face_pretrain`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

STEM = ((32, 2), (64, 2), (96, 2), (128, 2))   # (width, stride) per conv
EMBED_DIM = 128
CROP_SIZE = 64                                  # training/inference input


def _conv_init(key, shape):
    fan_in = int(np.prod(shape[:-1]))
    return jax.random.normal(key, shape) * (2.0 / fan_in) ** 0.5


def init_face_embed(key):
    keys = jax.random.split(key, 8)
    params = {"convs": []}
    cin = 3
    for i, (w, _) in enumerate(STEM):
        params["convs"].append({
            "k": _conv_init(keys[i], (3, 3, cin, w)),
            "b": jnp.zeros((w,)),
        })
        cin = w
    # identity needs spatial layout (eye spacing, mouth width): flatten the
    # final 4x4 grid instead of pooling it away
    flat = (CROP_SIZE // 16) ** 2 * cin
    params["proj"] = {"k": _conv_init(keys[6], (flat, EMBED_DIM)),
                      "b": jnp.zeros((EMBED_DIM,))}
    return params


def face_embed_forward(params, images01):
    """images01: (B, 64, 64, 3) float in [0,1] → (B, 128) L2-normalized."""
    x = images01.astype(jnp.float32) - 0.5
    for c, (_, stride) in zip(params["convs"], STEM):
        x = jax.lax.conv_general_dilated(
            x, c["k"], (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + c["b"]
        x = jax.nn.relu(x)
    x = x.reshape(x.shape[0], -1)
    z = x @ params["proj"]["k"] + params["proj"]["b"]
    return z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-6)


def _relight(img, rng):
    """Identity-preserving photometric augmentation: linear light gradient,
    brightness/gamma, mild color cast + noise (what a real clip's lighting
    changes do — the embedding must NOT move under these)."""
    h, w = img.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    theta = rng.uniform(0, 2 * np.pi)
    ramp = ((xx / w) * np.cos(theta) + (yy / h) * np.sin(theta))
    g = 1.0 + rng.uniform(0.0, 0.5) * (ramp - ramp.mean())
    out = img * g[..., None]
    out = out * rng.uniform(0.6, 1.3)                       # brightness
    out = np.clip(out, 0, 1) ** rng.uniform(0.7, 1.4)      # gamma
    out = out * rng.uniform(0.85, 1.15, 3)[None, None, :]  # color cast
    out = out + rng.normal(0, rng.uniform(0.005, 0.04), out.shape)
    return np.clip(out, 0, 1).astype(np.float32)


def render_crop_pool(rng, n_ids: int, views: int, size: int = CROP_SIZE):
    """Pre-render the contrastive pool ONCE: (n_ids, views, S, S, 3) aligned
    crops, each view a fresh pose/scale/angle render of the same identity
    with landmark noise on the crop (serving crops come from a noisy
    landmark detector). Rendering dominates training cost; pooling it makes
    the step loop photometric-aug-only (cheap numpy)."""
    from tpudf.data.synth_faces import random_identity, render_face
    from tpudf.serve.face import face_crop_from_landmarks

    pool = np.zeros((n_ids, views, size, size, 3), np.float32)
    big = size * 2
    for i in range(n_ids):
        ident = random_identity(rng)
        for v in range(views):
            img, lms, _ = render_face(big, ident, rng)
            noisy = lms * big + rng.normal(0, 1.0, lms.shape)
            crop = face_crop_from_landmarks(
                (img * 255).astype(np.uint8), noisy, out_size=size)
            pool[i, v] = crop.astype(np.float32) / 255.0
    return pool


def load_crop_pool_from_dir(path, size: int = CROP_SIZE,
                            max_ids: int | None = None,
                            max_views: int | None = None):
    """Build the contrastive pool from REAL identities on disk —
    ``path/<identity>/<image>`` with >=2 aligned face crops per identity
    (docs/CERTIFICATION.md §2 weights-upgrade recipe). Returns
    (n_ids, views, S, S, 3) float32 in [0,1]; views = the smallest
    per-identity image count so the pool is rectangular (identities with
    fewer than 2 images are skipped)."""
    import os

    from PIL import Image

    ids = sorted(d for d in os.listdir(path)
                 if os.path.isdir(os.path.join(path, d)))
    if max_ids:
        ids = ids[:max_ids]
    per_id = []
    for d in ids:
        files = sorted(
            f for f in os.listdir(os.path.join(path, d))
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp")))
        if len(files) >= 2:
            per_id.append((d, files))
    if len(per_id) < 2:
        raise ValueError(
            f"{path}: need >=2 identities with >=2 images each, "
            f"found {len(per_id)}")
    views = min(len(f) for _, f in per_id)
    if max_views:
        views = min(views, max_views)
    pool = np.zeros((len(per_id), views, size, size, 3), np.float32)
    for i, (d, files) in enumerate(per_id):
        for v in range(views):
            img = Image.open(os.path.join(path, d, files[v])).convert("RGB")
            pool[i, v] = np.asarray(
                img.resize((size, size), Image.BILINEAR),
                np.float32) / 255.0
    return pool


def make_pair_batch(rng, k_ids: int, size: int = CROP_SIZE, pool=None):
    """(2K, size, size, 3) aligned crops: rows [0..K) and [K..2K) are two
    photometrically-augmented views of the same K identities."""
    if pool is None:
        pool = render_crop_pool(rng, k_ids, 2, size)
        ids = np.arange(k_ids)
    else:
        ids = rng.choice(pool.shape[0], size=k_ids, replace=False)
    views = np.zeros((2, k_ids, size, size, 3), np.float32)
    for j, i in enumerate(ids):
        va, vb = rng.choice(pool.shape[1], size=2, replace=False)
        views[0, j] = _relight(pool[i, va], rng)
        views[1, j] = _relight(pool[i, vb], rng)
    return np.concatenate([views[0], views[1]], axis=0)


def nt_xent_loss(emb, temperature=0.1):
    """Normalized-temperature cross entropy over a (2K, D) two-view batch."""
    k = emb.shape[0] // 2
    sim = emb @ emb.T / temperature
    sim = sim - 1e9 * jnp.eye(2 * k)             # mask self-similarity
    targets = jnp.concatenate([jnp.arange(k) + k, jnp.arange(k)])
    return jnp.mean(-jax.nn.log_softmax(sim, axis=-1)[
        jnp.arange(2 * k), targets])


def train_face_embed(key=None, *, steps=2000, k_ids=32, n_ids=256,
                     pool_views=6, lr=1e-3, seed=0, log_every=0,
                     pool=None):
    """Contrastive pretraining on procedural identities (default) or on a
    caller-supplied (n_ids, views, S, S, 3) crop pool — e.g. real
    identities via load_crop_pool_from_dir, the CERTIFICATION.md §2
    upgrade path. Deterministic for a seed; a few minutes on CPU at the
    default budget (the identity pool renders once up front, the step
    loop is photometric-aug + conv only)."""
    import optax

    key = key if key is not None else jax.random.key(seed)
    params = init_face_embed(key)
    opt = optax.adam(optax.cosine_decay_schedule(lr, steps))
    state = opt.init(params)
    rng = np.random.default_rng(seed)
    if pool is None:
        pool = render_crop_pool(rng, n_ids, pool_views)
    k_ids = min(k_ids, pool.shape[0])

    @jax.jit
    def step(params, state, batch):
        def loss_fn(p):
            return nt_xent_loss(face_embed_forward(p, batch))
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, state2 = opt.update(g, state)
        return optax.apply_updates(params, upd), state2, loss

    for i in range(steps):
        batch = make_pair_batch(rng, k_ids, pool=pool)
        params, state, loss = step(params, state, jnp.asarray(batch))
        if log_every and (i + 1) % log_every == 0:
            print(f"[face_embed] step {i + 1}/{steps} "
                  f"loss={float(loss):.4f}")
    return params


FORMAT_VERSION = 1


def save_face_embed(params, path):
    flat = {"format_version": np.asarray(FORMAT_VERSION)}
    for i, c in enumerate(params["convs"]):
        flat[f"conv{i}_k"] = np.asarray(c["k"])
        flat[f"conv{i}_b"] = np.asarray(c["b"])
    flat["proj_k"] = np.asarray(params["proj"]["k"])
    flat["proj_b"] = np.asarray(params["proj"]["b"])
    np.savez(path, **flat)


def load_face_embed(path):
    z = np.load(path)
    ver = int(z["format_version"]) if "format_version" in z else 0
    if ver != FORMAT_VERSION:
        raise ValueError(
            f"face-embed checkpoint {path} has format v{ver}, expected "
            f"v{FORMAT_VERSION}; delete the cache / retrain")
    params = {"convs": []}
    i = 0
    while f"conv{i}_k" in z:
        params["convs"].append({"k": jnp.asarray(z[f"conv{i}_k"]),
                                "b": jnp.asarray(z[f"conv{i}_b"])})
        i += 1
    params["proj"] = {"k": jnp.asarray(z["proj_k"]),
                      "b": jnp.asarray(z["proj_b"])}
    return params
