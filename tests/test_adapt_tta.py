"""Few-shot adaptation, embedding anomaly, and TTA battery tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tpudf.data.tta import TTA_TRANSFORMS, tta_aggregate, tta_batch
from tpudf.serve.adapt import (embedding_anomaly_score, kernel_probe_predict,
                               linear_probe_predict, mean_real_embedding,
                               prototype_classify, train_kernel_probe,
                               train_linear_probe)


def _fewshot_data(n=60, d=32, seed=0):
    rng = np.random.default_rng(seed)
    y = (np.arange(n) % 2)
    X = rng.normal(0, 1, (n, d)).astype(np.float32)
    X[y == 1, :4] += 2.0
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return jnp.asarray(X), jnp.asarray(y)


def test_prototype_classifier():
    X, y = _fewshot_data()
    Xq, yq = _fewshot_data(seed=1)
    probs = prototype_classify(X, y, Xq)
    acc = float(jnp.mean((jnp.argmax(probs, 1) == yq).astype(jnp.float32)))
    assert acc > 0.85


def test_linear_probe():
    X, y = _fewshot_data()
    Xq, yq = _fewshot_data(seed=2)
    params = train_linear_probe(X, y)
    p = linear_probe_predict(params, Xq)
    acc = float(jnp.mean(((p > 0.5).astype(jnp.int32) == yq)
                         .astype(jnp.float32)))
    assert acc > 0.85


def test_kernel_probe():
    X, y = _fewshot_data()
    Xq, yq = _fewshot_data(seed=3)
    model = train_kernel_probe(X, y)
    p = kernel_probe_predict(model, Xq)
    acc = float(jnp.mean(((p > 0.5).astype(jnp.int32) == yq)
                         .astype(jnp.float32)))
    assert acc > 0.8


def test_embedding_anomaly():
    rng = np.random.default_rng(0)
    real = rng.normal(0, 1, (100, 32)).astype(np.float32)
    real[:, 0] += 5.0                   # coherent direction
    mu = mean_real_embedding(jnp.asarray(real))
    like_real = jnp.asarray(real[:5])
    unlike = jnp.asarray(-real[:5])
    s_real = embedding_anomaly_score(like_real, mu)
    s_fake = embedding_anomaly_score(unlike, mu)
    assert float(jnp.mean(s_fake)) > float(jnp.mean(s_real))


def test_tta_battery():
    x = jnp.asarray(np.random.default_rng(0)
                    .random((2, 32, 32, 3)).astype(np.float32))
    views, names = tta_batch(x)
    assert views.shape == (2, len(TTA_TRANSFORMS), 32, 32, 3)
    assert np.isfinite(np.asarray(views)).all()
    # involutions
    np.testing.assert_allclose(
        np.asarray(TTA_TRANSFORMS["hflip"](TTA_TRANSFORMS["hflip"](x))),
        np.asarray(x))
    z = jnp.asarray(np.random.default_rng(1).random((2, 9)))
    agg = tta_aggregate(z)
    assert agg.shape == (2,)
