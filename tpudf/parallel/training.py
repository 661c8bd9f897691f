"""Sharded training driver: mesh + train step + multi-host data feeding.

The reference trains single-GPU per script (SURVEY.md §2.4 — no DDP); this
is tpudf's scale-out training story, assembled from the pieces the rest of
the package already provides:

  * parameter placement over a (data, model) `jax.sharding.Mesh`
    (parallel/sharding.py: Megatron-style TP specs for the ViT blocks,
    replication for everything else),
  * a jitted train step (train/steps.py) whose dp gradient psum / TP
    collectives XLA inserts from the argument shardings — no explicit
    NCCL-style calls anywhere,
  * deterministic per-host batch assignment + global-array assembly
    (parallel/hostdata.py), so on a multi-host slice each host decodes only
    its own shard and no host ever materializes the global batch.

Exercised end-to-end on a virtual 8-device CPU mesh by
tests/test_parallel.py::test_sharded_trainer_matches_single_device and by
`__graft_entry__.dryrun_multichip` (the driver's multi-chip gate).
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpudf.core.mesh import DATA_AXIS
from tpudf.parallel.hostdata import (HostShardedSampler,
                                     global_batch_from_host_shards)
from tpudf.parallel.sharding import (named_shardings, replicate_tree,
                                     siglip_param_spec)
from tpudf.train.steps import init_train_state


class ShardedTrainer:
    """Owns sharded train state + the jitted step + host-sharded feeding.

    params: pytree of trainables. When it is {"backbone": ..., "head": ...}
    and tensor_parallel=True, the backbone gets the Megatron TP layout over
    the mesh's model axis; everything else is replicated. Optimizer state
    is created from the already-placed params, so optax's zeros_like
    mirrors every leaf's sharding automatically.
    """

    def __init__(self, mesh: Mesh, step_fn: Callable, optimizer,
                 params: Any, *, extra_replicated: Any = None,
                 tensor_parallel: bool | None = None,
                 ema_decay: float | None = None):
        self.mesh = mesh
        model_par = 1
        for name, size in mesh.shape.items():
            if name != DATA_AXIS:
                model_par = size
        if tensor_parallel is None:
            tensor_parallel = model_par > 1
        placed = {}
        if isinstance(params, dict) and "backbone" in params:
            bb_sh = named_shardings(mesh, siglip_param_spec(tensor_parallel),
                                    params["backbone"])
            placed["backbone"] = jax.tree.map(jax.device_put,
                                              params["backbone"], bb_sh)
            rest = {k: v for k, v in params.items() if k != "backbone"}
            placed.update(replicate_tree(mesh, rest))
        else:
            placed = replicate_tree(mesh, params)
        self.state = init_train_state(placed, optimizer, ema_decay)
        self.extra = (replicate_tree(mesh, extra_replicated)
                      if extra_replicated is not None else None)
        self._step = jax.jit(step_fn, donate_argnums=0)

    def _global(self, local: np.ndarray):
        return global_batch_from_host_shards(self.mesh, local)

    def step(self, batch: dict, rng) -> dict:
        """One optimizer step on this host's local batch slice. batch maps
        name → (local_B, ...) numpy arrays; they are assembled into global
        batch-sharded device arrays (pure host→own-devices transfer)."""
        dev_batch = {k: self._global(np.asarray(v)) for k, v in batch.items()}
        self.state, metrics = self._step(self.state, self.extra, dev_batch,
                                         rng)
        return metrics

    def run_epoch(self, arrays: dict, sampler: HostShardedSampler,
                  epoch: int, rng) -> dict:
        """Feed every global batch of `epoch` through the step. arrays maps
        name → (N, ...) host data (each host may hold the full array or a
        memory-mapped view — only local rows are ever touched)."""
        last = {}
        for bi, idx in enumerate(sampler.local_batches(epoch)):
            sub = jax.random.fold_in(rng, bi)
            last = self.step({k: v[idx] for k, v in arrays.items()}, sub)
        return last
