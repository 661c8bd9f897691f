"""Checkpoint save/restore via orbax.

Reference equivalents: best-by-F1 torch.save dicts with model/optim/sched/
epoch/metrics (siglip2siddataset.py:1609-1631, hidf :3078-3096, cifake
:1957-1965) and safetensors for small heads (train_fusion_head_only.py:453).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str, state: dict, metrics: dict | None = None):
    """Save a pytree checkpoint (params/opt_state/epoch/...) with orbax;
    metrics sidecar as JSON."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = jax.tree.map(np.asarray, state)
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if metrics is not None:
        with open(path + ".metrics.json", "w") as f:
            json.dump(_to_jsonable(metrics), f, indent=2)


def restore_checkpoint(path: str, like: Any):
    """Restore into the structure of `like` (a template pytree)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = jax.tree.map(np.asarray, like)
    return ckptr.restore(path, template)


def restore_train_state(path: str, params: Any, optimizer,
                        ema_decays=(None, 0.999)):
    """Restore a trainer checkpoint (``state._asdict() | {"epoch": e}``,
    the layout every CLI trainer's save_best writes) without knowing
    whether it was trained with EMA: tries templates with and without an
    EMA slot, mirroring the reference's checkpoint-shape auto-detection
    (inference_ai_human_images.py:804-827). Returns the restored dict
    (keys params/opt_state/ema/step/epoch)."""
    from tpudf.train.steps import init_train_state
    if not os.path.exists(path):         # genuine I/O problems surface
        raise FileNotFoundError(path)    # directly, not as "cannot restore"
    err = None
    for d in ema_decays:
        template = init_train_state(params, optimizer, d)._asdict() \
            | {"epoch": 0}
        try:
            return restore_checkpoint(path, template)
        except (ValueError, TypeError, KeyError) as e:
            err = e                      # structure/shape mismatch → next
    raise ValueError(f"cannot restore train state from {path}") from err


def load_metrics(path: str) -> dict | None:
    p = path + ".metrics.json"
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def save_head_safetensors(path: str, params: dict):
    """Flat safetensors export for small heads (fusion/freq), mirroring the
    reference artifact format."""
    from safetensors.numpy import save_file
    flat = {}

    def walk(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(f"{prefix}.{k}" if prefix else k, v)
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                walk(f"{prefix}.{i}", v)
        else:
            # safetensors serializes the raw buffer: non-contiguous views
            # (e.g. transposes) would be silently scrambled
            flat[prefix] = np.ascontiguousarray(np.asarray(tree))

    walk("", params)
    save_file(flat, path)


def load_state_filtered(sd: dict, template: dict, log_fn=print):
    """Strict→filtered state loading: keep only keys whose shapes match the
    template, report the rest (appv3.py:1257-1263 `_filter_state_for_model`
    + inference_ai_human_images.py:841-857 non-strict fallback)."""
    import jax
    flat_t = _flatten(template)
    flat_s = _flatten(sd)
    out = dict(flat_t)
    missing, mismatched, used = [], [], 0
    for k, v in flat_t.items():
        if k not in flat_s:
            missing.append(k)
        elif np.shape(flat_s[k]) != np.shape(v):
            mismatched.append((k, np.shape(flat_s[k]), np.shape(v)))
        else:
            out[k] = np.asarray(flat_s[k])
            used += 1
    if missing:
        log_fn(f"[ckpt] {len(missing)} keys missing (kept init): "
               f"{missing[:5]}…")
    if mismatched:
        log_fn(f"[ckpt] {len(mismatched)} shape mismatches skipped: "
               f"{mismatched[:3]}…")
    log_fn(f"[ckpt] loaded {used}/{len(flat_t)} tensors")
    return _unflatten(out, template)


def detect_feature_dim(sd: dict, candidates=(768, 1024, 1152)) -> int | None:
    """Infer the backbone feature dim from a head state dict
    (inference_ai_human_images.py:804-827 checkpoint auto-detection)."""
    for k, v in _flatten(sd).items():
        shp = np.shape(v)
        if len(shp) == 2:
            for c in candidates:
                if c in shp:
                    return c
    return None


def _flatten(tree, prefix=""):
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}.{k}" if prefix else str(k)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(_flatten(v, f"{prefix}.{i}"))
    else:
        flat[prefix] = tree
    return flat


def _unflatten(flat: dict, template, prefix=""):
    if isinstance(template, dict):
        return {k: _unflatten(flat, v, f"{prefix}.{k}" if prefix else str(k))
                for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        out = [_unflatten(flat, v, f"{prefix}.{i}" if prefix else str(i))
               for i, v in enumerate(template)]
        return type(template)(out)
    return flat[prefix]


def _to_jsonable(x):
    if isinstance(x, dict):
        return {k: _to_jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_to_jsonable(v) for v in x]
    if isinstance(x, (np.ndarray, jax.Array)):
        return np.asarray(x).tolist()
    if isinstance(x, (np.floating, np.integer)):
        return x.item()
    return x
