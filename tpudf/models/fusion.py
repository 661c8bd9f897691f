"""Expert-fusion heads combining the SigLIP and frequency experts.

  * deployed FusionHead — Linear(2→1) over (p_sig, p_freq) probabilities
    (appv3.py:1565-1590; artifact siglip/fusion_head.safetensors = fc.{weight,bias})
  * AdaptiveFusionHeadV5 — [z_freq, z_sig, |Δ|] → MLP(3→32→2) → softmax
    weights → weighted logit sum → temperature (appv3.py:1543-1562,
    train_fusion_head_only.py:303-317)
  * GBDT fusion evaluator — pure-JAX evaluation of an XGBoost-style tree
    ensemble over the 19-d meta-feature vector + Platt scale
    (appv3.py:1427-1477, 5507-5578)
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from tpudf.utils.nn import mm


# ----------------------------------------------------------- linear fusion

def init_fusion_linear(key):
    return {"w": jax.random.normal(key, (2, 1)) * 0.5, "b": jnp.zeros((1,))}


def apply_fusion_linear(params, p_sig, p_freq):
    """(…,) probabilities → fused logit (appv3.py:3256-3259 semantics)."""
    x = jnp.stack([p_sig, p_freq], axis=-1)
    return (mm(x, params["w"]) + params["b"])[..., 0]


def fusion_linear_from_safetensors(path):
    from safetensors.numpy import load_file
    sd = load_file(path)
    return {"w": jnp.asarray(sd["fc.weight"].T), "b": jnp.asarray(sd["fc.bias"])}


# --------------------------------------------------------- adaptive fusion

def init_adaptive_fusion(key, hidden=32):
    k1, k2 = jax.random.split(key)
    s = lambda k, i, o: jax.random.normal(k, (i, o)) * (i ** -0.5)
    return {
        "fc1": {"w": s(k1, 3, hidden), "b": jnp.zeros((hidden,))},
        "fc2": {"w": s(k2, hidden, 2), "b": jnp.zeros((2,))},
        "temp": jnp.asarray(1.0),
    }


def apply_adaptive_fusion(params, z_freq, z_sig):
    diff = jnp.abs(z_freq - z_sig)
    x = jnp.stack([z_freq, z_sig, diff], axis=-1)
    h = jax.nn.gelu(mm(x, params["fc1"]["w"]) + params["fc1"]["b"], approximate=False)
    w = jax.nn.softmax(mm(h, params["fc2"]["w"]) + params["fc2"]["b"], axis=-1)
    z = w[..., 0] * z_freq + w[..., 1] * z_sig
    return z / (params["temp"] + 1e-6)


# -------------------------------------------------------------- GBDT eval

class TreeEnsemble:
    """Pure-JAX inference for a binary-classification GBDT (XGBoost JSON).

    The reference optionally overrides the fusion probability with an XGBoost
    booster + Platt scaling (appv3.py:5507-5578). XGBoost itself is a C++
    dependency; on TPU we evaluate the trees as a vectorized gather walk —
    each tree is a table of (feature, threshold, left, right, leaf_value) and
    every sample descends `depth` times via jnp.take, so a whole batch
    evaluates as a few gathers (no host round-trip).
    """

    def __init__(self, feats, thresh, left, right, leaf, base_score=0.0,
                 platt_a=1.0, platt_b=0.0):
        # arrays shaped (n_trees, max_nodes)
        self.feats = jnp.asarray(feats, jnp.int32)
        self.thresh = jnp.asarray(thresh, jnp.float32)
        self.left = jnp.asarray(left, jnp.int32)
        self.right = jnp.asarray(right, jnp.int32)
        self.leaf = jnp.asarray(leaf, jnp.float32)
        self.base_score = float(base_score)
        self.platt_a = float(platt_a)
        self.platt_b = float(platt_b)
        self.max_depth = int(np.ceil(np.log2(self.feats.shape[1] + 1))) + 1

    @classmethod
    def from_xgboost_json(cls, path, platt_path=None):
        with open(path) as f:
            model = json.load(f)
        learner = model["learner"]
        trees = learner["gradient_booster"]["model"]["trees"]
        base = float(learner["learner_model_param"].get("base_score", 0.5))
        n = len(trees)
        maxn = max(len(t["split_indices"]) for t in trees)
        feats = np.zeros((n, maxn), np.int32)
        thresh = np.zeros((n, maxn), np.float32)
        left = np.zeros((n, maxn), np.int32)
        right = np.zeros((n, maxn), np.int32)
        leaf = np.zeros((n, maxn), np.float32)
        for i, t in enumerate(trees):
            m = len(t["split_indices"])
            feats[i, :m] = t["split_indices"]
            thresh[i, :m] = t["split_conditions"]
            lc = np.asarray(t["left_children"])
            rc = np.asarray(t["right_children"])
            is_leaf = lc == -1
            # leaves: loop to self so extra walk steps are no-ops
            idx = np.arange(m)
            left[i, :m] = np.where(is_leaf, idx, lc)
            right[i, :m] = np.where(is_leaf, idx, rc)
            leaf[i, :m] = np.where(is_leaf, t["split_conditions"], 0.0)
            thresh[i, :m] = np.where(is_leaf, -np.inf, thresh[i, :m])
        pa, pb = 1.0, 0.0
        if platt_path is not None:
            with open(platt_path) as f:
                platt = json.load(f)
            pa, pb = float(platt.get("a", 1.0)), float(platt.get("b", 0.0))
        base_margin = float(np.log(base / (1 - base))) if 0 < base < 1 else base
        return cls(feats, thresh, left, right, leaf, base_margin, pa, pb)

    def margins(self, x):
        """x: (B, F) → (B,) raw ensemble margin."""
        b = x.shape[0]
        node = jnp.zeros((b, self.feats.shape[0]), jnp.int32)

        def step(node, _):
            f = jnp.take_along_axis(self.feats[None], node[..., None],
                                    axis=2)[..., 0]          # (B, T)
            t = jnp.take_along_axis(self.thresh[None], node[..., None],
                                    axis=2)[..., 0]
            xv = jnp.take_along_axis(x, f, axis=1)       # (B, T)
            l = jnp.take_along_axis(self.left[None], node[..., None],
                                    axis=2)[..., 0]
            r = jnp.take_along_axis(self.right[None], node[..., None],
                                    axis=2)[..., 0]
            return jnp.where(xv < t, l, r), None

        node, _ = jax.lax.scan(step, node, None, length=self.max_depth)
        vals = jnp.take_along_axis(self.leaf[None], node[..., None],
                                   axis=2)[..., 0]
        return jnp.sum(vals, axis=1) + self.base_score

    def predict_proba(self, x):
        z = self.margins(x)
        return jax.nn.sigmoid(self.platt_a * z + self.platt_b)
