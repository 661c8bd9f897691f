"""Multi-host data feeding for the dp mesh.

The reference is single-process (SURVEY.md §2.4); tpudf's scale-out path
shards the batch axis over a (data, model) mesh that may span hosts. On
multi-host TPU slices each host must decode ONLY the examples that land on
its own devices — shipping a full global batch from every host would
multiply decode work and DCN traffic by the host count.

Pieces:
  * HostShardedSampler — deterministic per-host index assignment (host p
    of P takes the p-th CONTIGUOUS block of every global batch), epoch-
    seeded shuffling identical on every host so the global permutation is
    coherent without any coordination traffic. Blocks (not strides): with
    the standard process-major device order,
    jax.make_array_from_process_local_data lays host p's rows at global
    positions [p*B/P, (p+1)*B/P) — contiguous assignment makes the
    assembled global batch IDENTICAL in order to the single-process batch,
    so trajectories match bit-for-bit even through order-sensitive ops
    (per-position dropout masks, mixup pairings). Validated by the real
    2-process run in tests/test_multiprocess.py.
  * global_batch_from_host_shards — assembles the global device array from
    each process's local shard via jax.make_array_from_process_local_data:
    no host ever materializes the global batch, and the transfer is purely
    host→its-own-devices.

Single-process (tests, the dev chip) degenerates cleanly: process_count=1
means the sampler yields everything and the assembler is equivalent to a
sharded device_put.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpudf.core.mesh import DATA_AXIS


class HostShardedSampler:
    """Per-host slice of a global sample order.

    n: dataset size. Global order = seeded permutation (or arange), padded
    by wrap-around to a multiple of (global_batch), then host p takes rows
    [p*B/P, (p+1)*B/P) of every global batch — the same rows
    make_array_from_process_local_data will place at those global
    positions (process-major device order).
    """

    def __init__(self, n: int, global_batch: int, *, shuffle=True, seed=0,
                 process_index=None, process_count=None):
        self.n = int(n)
        self.global_batch = int(global_batch)
        self.p = (jax.process_index() if process_index is None
                  else process_index)
        self.np_ = (jax.process_count() if process_count is None
                    else process_count)
        if self.global_batch % self.np_:
            raise ValueError(
                f"global_batch {global_batch} not divisible by "
                f"process_count {self.np_}")
        self.local_batch = self.global_batch // self.np_
        self.shuffle = shuffle
        self.seed = seed

    def epoch_order(self, epoch: int) -> np.ndarray:
        """The GLOBAL order for this epoch — identical on every host."""
        if self.shuffle:
            order = np.random.default_rng(
                self.seed * 100_003 + epoch).permutation(self.n)
        else:
            order = np.arange(self.n)
        pad = (-self.n) % self.global_batch
        if pad:
            # np.resize tiles the order as many times as needed — a plain
            # order[:pad] slice is silently short when global_batch > n
            order = np.concatenate([order, np.resize(order, pad)])
        return order

    def local_batches(self, epoch: int):
        """Yield this host's index arrays, one per global batch."""
        order = self.epoch_order(epoch)
        lb = self.local_batch
        for start in range(0, len(order), self.global_batch):
            gb = order[start:start + self.global_batch]
            yield gb[self.p * lb:(self.p + 1) * lb]   # (local_batch,)


def global_batch_from_host_shards(mesh: Mesh, local_batch: np.ndarray,
                                  extra_spec=()):
    """Assemble the global batch-sharded device array from each process's
    local shard (jax.make_array_from_process_local_data). local_batch:
    (local_B, ...) — this host's rows only. Returns a jax.Array whose
    global shape is (local_B * process_count, ...), sharded over the
    mesh's data axis."""
    spec = P(DATA_AXIS, *extra_spec) if extra_spec else P(
        DATA_AXIS, *([None] * (np.ndim(local_batch) - 1)))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_batch))
