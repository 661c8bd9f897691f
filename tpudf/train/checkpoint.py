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
            flat[prefix] = np.asarray(tree)

    walk("", params)
    save_file(flat, path)


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
