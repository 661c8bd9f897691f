"""Few-shot adaptation + embedding anomaly over frozen SigLIP features.

Re-implements the reference's inference-time adaptation toolkit:
  * prototype classifier — softmax over −cdist/T to class means
    (inference_deepfakeface_complete.py:904-925,
     inference_ai_human_images.py:436-543 "100-shot prototype adaptation")
  * linear probe — ridge-regularized logistic probe trained on support
    features (inference_deepfakeface_complete.py:949-1013)
  * kernel probe — RBF-kernel logistic classifier, the JAX stand-in for the
    reference's SVM-RBF (:927-947)
  * embedding anomaly — L2-norm + cosine deviation from the cached
    mean-real-embedding (appv3.py:3494-3516, 1306-1370)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def prototype_classify(support_feats, support_labels, query_feats,
                       temperature=0.1, num_classes=2):
    """Nearest-prototype soft classification.
    support_feats: (N, D) L2-normalized; query_feats: (Q, D).
    Returns (Q, C) probabilities."""
    protos = []
    for c in range(num_classes):
        mask = (support_labels == c).astype(jnp.float32)
        proto = jnp.sum(support_feats * mask[:, None], axis=0) / (
            jnp.sum(mask) + 1e-8)
        protos.append(proto)
    protos = jnp.stack(protos)                           # (C, D)
    d = jnp.linalg.norm(query_feats[:, None] - protos[None], axis=-1)
    return jax.nn.softmax(-d / temperature, axis=-1)


def train_linear_probe(support_feats, support_labels, *, steps=300, lr=1e-2,
                       l2=1e-3, seed=0):
    """Logistic linear probe on frozen features; returns (w, b)."""
    X = jnp.asarray(support_feats, jnp.float32)
    y = jnp.asarray(support_labels, jnp.float32)
    d = X.shape[1]
    params = {"w": jnp.zeros((d,)), "b": jnp.asarray(0.0)}
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            z = X @ p["w"] + p["b"]
            ce = -jnp.mean(y * jax.nn.log_sigmoid(z)
                           + (1 - y) * jax.nn.log_sigmoid(-z))
            return ce + l2 * jnp.sum(p["w"] ** 2)
        loss, g = jax.value_and_grad(loss_fn)(params)
        u, state = opt.update(g, state)
        return optax.apply_updates(params, u), state, loss

    for _ in range(steps):
        params, state, loss = step(params, state)
    return params


def linear_probe_predict(params, query_feats):
    return jax.nn.sigmoid(query_feats @ params["w"] + params["b"])


def train_kernel_probe(support_feats, support_labels, *, gamma=None,
                       steps=300, lr=5e-2, l2=1e-3):
    """RBF-kernel logistic classifier (SVM-RBF stand-in): learns dual
    coefficients over the support kernel matrix."""
    X = jnp.asarray(support_feats, jnp.float32)
    y = jnp.asarray(support_labels, jnp.float32)
    n, d = X.shape
    if gamma is None:
        gamma = 1.0 / d
    sq = jnp.sum(X ** 2, 1)
    K = jnp.exp(-gamma * (sq[:, None] + sq[None] - 2 * X @ X.T))
    params = {"alpha": jnp.zeros((n,)), "b": jnp.asarray(0.0)}
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            z = K @ p["alpha"] + p["b"]
            ce = -jnp.mean(y * jax.nn.log_sigmoid(z)
                           + (1 - y) * jax.nn.log_sigmoid(-z))
            return ce + l2 * p["alpha"] @ K @ p["alpha"]
        loss, g = jax.value_and_grad(loss_fn)(params)
        u, state = opt.update(g, state)
        return optax.apply_updates(params, u), state, loss

    for _ in range(steps):
        params, state, _ = step(params, state)
    return {"alpha": params["alpha"], "b": params["b"], "X": X,
            "gamma": gamma}


def kernel_probe_predict(model, query_feats):
    Q = jnp.asarray(query_feats, jnp.float32)
    sq_q = jnp.sum(Q ** 2, 1)
    sq_x = jnp.sum(model["X"] ** 2, 1)
    K = jnp.exp(-model["gamma"] * (sq_q[:, None] + sq_x[None]
                                   - 2 * Q @ model["X"].T))
    return jax.nn.sigmoid(K @ model["alpha"] + model["b"])


# -------------------------------------------------------- embedding anomaly

def mean_real_embedding(real_feats):
    """Cache the mean L2-normalized real embedding
    (appv3.py REAL_REF_DIR / mean_real_embedding.npy equivalent)."""
    f = real_feats / (jnp.linalg.norm(real_feats, axis=-1, keepdims=True)
                      + 1e-6)
    mu = jnp.mean(f, axis=0)
    return mu / (jnp.linalg.norm(mu) + 1e-6)


def embedding_anomaly_score(feats, mean_real=None):
    """L2-norm spread + cosine deviation from the real-embedding anchor
    (appv3.py:3494-3516). Returns (B,) in [0,1]."""
    norms = jnp.linalg.norm(feats, axis=-1)
    norm_dev = jnp.clip(jnp.abs(norms - jnp.mean(norms))
                        / (jnp.std(norms) + 1e-6) / 4.0, 0.0, 1.0)
    if mean_real is None:
        return norm_dev
    f = feats / (norms[:, None] + 1e-6)
    cos = f @ mean_real
    cos_dev = jnp.clip((1.0 - cos) / 0.6, 0.0, 1.0)
    return jnp.clip(0.4 * norm_dev + 0.6 * cos_dev, 0.0, 1.0)
