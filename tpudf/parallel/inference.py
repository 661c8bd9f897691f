"""Multi-chip batch-parallel inference and training entry points.

The reference is strictly single-device (SURVEY.md §2.4). These wrappers
scale the tpudf graphs over a (data, model) mesh:
  * sharded_forward — batch axis sharded over "data"; params replicated (or
    TP-sharded via parallel/sharding.py for the SO400M backbone)
  * DataParallelRunner — pads the final partial batch to the mesh multiple,
    device_puts with NamedSharding, runs the jitted fn once per batch
  * eval-metric reductions ride implicit psum from jnp reductions under jit

Collectives are inserted by XLA from the shardings; nothing here issues
explicit psum calls for the DP-only path.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpudf.core.mesh import DATA_AXIS


class DataParallelRunner:
    """Run a jitted per-batch function with the batch axis sharded over the
    mesh's data axis. Handles remainder padding (TPU static shapes).

    The function body runs under shard_map so Pallas kernels (attention,
    fused LN/MLP) execute per-shard — the SPMD partitioner cannot split an
    opaque pallas_call on its own."""

    def __init__(self, mesh: Mesh, fn: Callable, batch_multiple: int | None
                 = None, use_shard_map: bool = True):
        self.mesh = mesh
        self.n_data = mesh.shape[DATA_AXIS]
        self.batch_multiple = batch_multiple or self.n_data
        if use_shard_map:
            def wrapped(*args):
                *params, batch = args
                smapped = jax.shard_map(
                    lambda ps, bt: fn(*ps, bt),
                    mesh=mesh,
                    in_specs=(P(), P(DATA_AXIS)),
                    out_specs=P(DATA_AXIS),
                    check_vma=False)
                return smapped(tuple(params), batch)
            self.fn = jax.jit(wrapped)
        else:
            self.fn = jax.jit(fn)

    def _shard(self, x):
        spec = P(DATA_AXIS, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(jnp.asarray(x), NamedSharding(self.mesh, spec))

    def __call__(self, *replicated_args, batch):
        b = batch.shape[0]
        m = self.batch_multiple
        pad = (-b) % m
        if pad:
            batch = np.concatenate(
                [batch, np.repeat(batch[-1:], pad, axis=0)], axis=0)
        out = self.fn(*replicated_args, self._shard(batch))
        return jax.tree.map(lambda o: np.asarray(o)[:b], out)


def sharded_siglip_features(mesh: Mesh, backbone_params, cfg, policy=None,
                            tensor_parallel=False):
    """Build a runner computing pooled SigLIP features with dp (and optional
    tp) sharding."""
    from tpudf.core.precision import DEFAULT_POLICY
    from tpudf.models.siglip import siglip_forward
    from tpudf.parallel.sharding import shard_siglip_params

    policy = policy or DEFAULT_POLICY
    if tensor_parallel:
        backbone_params = shard_siglip_params(mesh, backbone_params, True)
    else:
        rep = NamedSharding(mesh, P())
        backbone_params = jax.tree.map(
            lambda x: jax.device_put(x, rep), backbone_params)

    def fn(params, pixels):
        return siglip_forward(params, pixels, cfg, policy)["pooled"]

    # TP shards the weights themselves — let the SPMD partitioner place the
    # collectives (plain-XLA path); shard_map only for the dp-pallas path.
    runner = DataParallelRunner(mesh, fn, use_shard_map=not tensor_parallel)
    return functools.partial(runner, backbone_params)


def sharded_detect_core(mesh: Mesh, engine):
    """Batch-parallel fused detect_core over the mesh (the throughput
    north-star path: batch inference scales linearly over chips via ICI)."""
    from tpudf.serve.engine import _detect_batch

    rep = NamedSharding(mesh, P())
    put = lambda t: jax.tree.map(lambda x: jax.device_put(x, rep), t)
    backbone = put(engine.backbone)
    head = put(engine.head)
    freq = put(engine.freq)
    fusion = put(engine.fusion)

    def fn(backbone, head, freq, fusion, pixels):
        return _detect_batch(backbone, head, freq, fusion, pixels,
                             cfg=engine.cfg, policy=engine.policy,
                             cuts=engine.cuts)

    runner = DataParallelRunner(mesh, fn)

    def run(pixels_uint8):
        from tpudf.serve.engine import FULL_SCALARS, _unpack
        out = runner(backbone, head, freq, fusion,
                     batch=np.asarray(pixels_uint8))
        return _unpack(dict(out), FULL_SCALARS)

    return run
