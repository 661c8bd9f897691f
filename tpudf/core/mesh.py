"""Device mesh and sharding helpers.

The reference has no real distributed execution (SURVEY.md §2.4: no
init_process_group anywhere; FSDP is an optional single-process wrap,
cifake_binary_classifier.py:78-84). The TPU-native design scales through a
`jax.sharding.Mesh`:

  * axis "data"  — batch/data parallelism (the primary axis: all models here
    are ≤400M-param ViTs with tiny trainable heads, so DP is the right scale-out)
  * axis "model" — optional parameter/feature sharding for the largest backbone
    (SO400M) or very large fused inference batches.

Collectives ride ICI implicitly via pjit-inserted psum/all-gather.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Sequence[jax.Device] | None = None,
              data: int | None = None,
              model: int = 1) -> Mesh:
    """Create a 2-D (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays on the mesh, batch-axis sharded."""
    def _put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))
    return jax.tree.map(_put, batch)
