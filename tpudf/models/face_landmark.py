"""5-point face landmark network — the TPU-native stand-in for the
reference's insightface detector (appv3.py:67-90: 5-pt landmarks feeding
face_topology/track/embedding drift, :3557-3755).

Tiny conv net in pure JAX (param-dict style like models/siglip.py):
strided conv stem to a 16x16 feature map, then
  * a 5-channel HEATMAP head decoded by spatial soft-argmax — landmark
    coordinates are the softmax-weighted expectation of bin centers, so
    they are tied to where image evidence actually is. (A pooled-feature
    regression head was tried first and regressed intra-face geometry to
    the dataset mean — exactly the identity signal the drift cues need.)
  * pooled presence / box heads.
Single dominant face (the reference's drift signals only use the largest
face).

The environment is egress-free, so no pretrained face weights exist here;
`train_landmark_net` pretrains on the procedural generator
(data/synth_faces.py) — deterministic, a few thousand steps, cacheable to
disk via save/load. For production accuracy on real photography, load
converted external weights through the same param layout (the net is
intentionally layout-compatible: conv kernels HWIO, dense in/out).

Coordinates are normalized to [0, 1] over the input square. Landmark order
follows insightface: left eye, right eye, nose, left mouth, right mouth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

STEM = ((24, 2), (48, 2), (64, 1), (64, 1))   # (width, stride) per conv
HEAT_HW = 16                                   # heatmap resolution


def _conv_init(key, shape):
    fan_in = int(np.prod(shape[:-1]))
    return jax.random.normal(key, shape) * (2.0 / fan_in) ** 0.5


def init_landmark_net(key, size: int = 64):
    """Input (B, size, size, 3); size must be divisible by 4
    (the stem downsamples 4x; the heatmap is size//4 per side)."""
    keys = jax.random.split(key, 16)
    params = {"convs": []}
    cin = 3
    for i, (w, _) in enumerate(STEM):
        params["convs"].append({
            "k": _conv_init(keys[i], (3, 3, cin, w)),
            "b": jnp.zeros((w,)),
        })
        cin = w
    params["head_heat"] = {"k": _conv_init(keys[8], (1, 1, cin, 5)),
                           "b": jnp.zeros((5,))}
    params["dense"] = {"k": _conv_init(keys[9], (cin, 64)),
                       "b": jnp.zeros((64,))}
    params["head_presence"] = {"k": _conv_init(keys[10], (64, 1)),
                               "b": jnp.zeros((1,))}
    params["head_box"] = {"k": _conv_init(keys[11], (64, 4)),
                          "b": jnp.zeros((4,))}
    return params


def landmark_forward(params, images01):
    """images01: (B, S, S, 3) float in [0,1] → dict:
    presence (B,) logit, box (B,4) normalized (cx,cy,w,h),
    landmarks (B,5,2) normalized (x,y).

    Landmarks decode by soft-argmax over per-landmark heatmaps: coordinate
    = softmax-weighted expectation of spatial bin centers. The expectation
    interpolates between bins, so precision is sub-bin; because the
    decoder can only move mass between image positions, it cannot regress
    face geometry toward a dataset mean the way a pooled regression head
    does."""
    x = images01.astype(jnp.float32) - 0.5
    for c, (_, stride) in zip(params["convs"], STEM):
        x = jax.lax.conv_general_dilated(
            x, c["k"], (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + c["b"]
        x = jax.nn.relu(x)
    b, gh, gw, cin = x.shape

    heat = jax.lax.conv_general_dilated(
        x, params["head_heat"]["k"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["head_heat"]["b"]
    logits = heat.reshape(b, gh * gw, 5)
    w = jax.nn.softmax(logits * 2.0, axis=1)       # fixed temperature
    ys = (jnp.arange(gh, dtype=jnp.float32) + 0.5) / gh
    xs = (jnp.arange(gw, dtype=jnp.float32) + 0.5) / gw
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"),
                     axis=-1).reshape(gh * gw, 2)  # (HW, 2) = (x, y)
    lms = jnp.einsum("bnk,nc->bkc", w, grid)       # (B, 5, 2)

    pooled = x.mean(axis=(1, 2))
    h = jax.nn.relu(pooled @ params["dense"]["k"] + params["dense"]["b"])
    pres = (h @ params["head_presence"]["k"]
            + params["head_presence"]["b"])[:, 0]
    box = jax.nn.sigmoid(h @ params["head_box"]["k"]
                         + params["head_box"]["b"])
    return {"presence": pres, "box": box, "landmarks": lms}


def train_landmark_net(key=None, *, steps=1500, batch=64, size=64,
                       lr=2e-3, seed=0, log_every=0):
    """Pretrain on procedural faces (data/synth_faces.py). Deterministic
    for a given seed. Returns trained params. ~tens of seconds on CPU at
    the default budget; landmark MAE on held-out synthetic faces ~1-2 px
    at 64px input."""
    import optax

    from tpudf.data.synth_faces import make_batch

    key = key if key is not None else jax.random.key(seed)
    params = init_landmark_net(key, size)
    opt = optax.adam(lr)
    state = opt.init(params)
    rng = np.random.default_rng(seed)

    @jax.jit
    def step(params, state, imgs, pres, lms, boxes):
        def loss_fn(p):
            out = landmark_forward(p, imgs)
            l_pres = jnp.mean(optax.sigmoid_binary_cross_entropy(
                out["presence"], pres))
            m = pres[:, None, None]
            # supervise in BOX-RELATIVE units: geometry errors weigh the
            # same on small and large faces, so the head resolves
            # intra-face proportions instead of averaging them away
            wh = jnp.maximum(boxes[:, None, 2:], 0.05)
            l_lm = jnp.sum(m * ((out["landmarks"] - lms) / wh) ** 2) \
                / (jnp.sum(m) * 10.0 + 1e-6)
            mb = pres[:, None]
            l_box = jnp.sum(mb * (out["box"] - boxes) ** 2) \
                / (jnp.sum(mb) * 4.0 + 1e-6)
            return l_pres + 10.0 * l_lm + 2.0 * l_box, (l_pres, l_lm)
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    for i in range(steps):
        imgs, pres, lms, boxes = make_batch(rng, batch, size)
        params, state, loss = step(params, state, jnp.asarray(imgs),
                                   jnp.asarray(pres), jnp.asarray(lms),
                                   jnp.asarray(boxes))
        if log_every and (i + 1) % log_every == 0:
            print(f"[face_landmark] step {i + 1}/{steps} "
                  f"loss={float(loss):.4f}")
    return params


FORMAT_VERSION = 3  # v3 = heatmap/soft-argmax landmark decoder

_HEADS = ("head_heat", "dense", "head_presence", "head_box")


def save_landmark_net(params, path):
    """Flat .npz save (no safetensors dependency needed)."""
    flat = {"format_version": np.asarray(FORMAT_VERSION)}
    for i, c in enumerate(params["convs"]):
        flat[f"conv{i}_k"] = np.asarray(c["k"])
        flat[f"conv{i}_b"] = np.asarray(c["b"])
    for name in _HEADS:
        flat[f"{name}_k"] = np.asarray(params[name]["k"])
        flat[f"{name}_b"] = np.asarray(params[name]["b"])
    np.savez(path, **flat)


def load_landmark_net(path):
    z = np.load(path)
    ver = int(z["format_version"]) if "format_version" in z else 1
    if ver != FORMAT_VERSION:
        raise ValueError(
            f"landmark checkpoint {path} has format v{ver}, expected "
            f"v{FORMAT_VERSION} (landmark parameterization changed); "
            "delete the cache / retrain")
    params = {"convs": []}
    i = 0
    while f"conv{i}_k" in z:
        params["convs"].append({"k": jnp.asarray(z[f"conv{i}_k"]),
                                "b": jnp.asarray(z[f"conv{i}_b"])})
        i += 1
    for name in _HEADS:
        params[name] = {"k": jnp.asarray(z[f"{name}_k"]),
                        "b": jnp.asarray(z[f"{name}_b"])}
    return params
