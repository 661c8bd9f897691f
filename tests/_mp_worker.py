"""Worker for the 2-process CPU smoke test (tests/test_multiprocess.py).

Launched via `python -m tpudf.cli.launch --nprocs 2 --cpu_devices 4 --
python tests/_mp_worker.py --out X.npz`: each process initializes
jax.distributed from the launcher's env (gloo CPU collectives), builds the
same global (data=4, model=2) mesh over the 8 global devices, and drives
HostShardedSampler + ShardedTrainer for one epoch on deterministic
synthetic data — each host feeding ONLY its own index slice. Process 0
saves the final loss and (replicated) head weights for the trajectory
comparison against the single-process 8-device run.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpudf.parallel.dist import initialize_from_env

initialize_from_env()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from tpudf.core.mesh import make_mesh  # noqa: E402
from tpudf.core.precision import F32_POLICY  # noqa: E402
from tpudf.models.heads import init_binary_head  # noqa: E402
from tpudf.models.siglip import CONFIGS, init_siglip  # noqa: E402
from tpudf.parallel.hostdata import HostShardedSampler  # noqa: E402
from tpudf.parallel.training import ShardedTrainer  # noqa: E402
from tpudf.train.steps import make_binary_train_step, make_optimizer  # noqa: E402

CFG = CONFIGS["test-32"]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--epochs", type=int, default=1)
    args = p.parse_args(argv)

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4, len(jax.local_devices())
    mesh = make_mesh(jax.devices(), data=4, model=2)

    # identical on every host (deterministic seeds)
    rng = np.random.default_rng(0)
    n, gb, s = 16, 8, 32
    pixels = rng.random((n, s, s, 3)).astype(np.float32)
    labels = (np.arange(n) % 2).astype(np.float32)

    bb = init_siglip(jax.random.key(3), CFG)
    head = init_binary_head(jax.random.key(4), CFG.width)
    opt = make_optimizer(lr=1e-3, total_steps=8 * args.epochs,
                         grad_clip=1.0)
    step = make_binary_train_step(CFG, opt, policy=F32_POLICY,
                                  train_backbone=True)

    trainer = ShardedTrainer(mesh, step, opt, {"backbone": bb, "head": head})
    sampler = HostShardedSampler(n, gb, seed=1)
    assert sampler.np_ == 2 and sampler.local_batch == gb // 2
    for epoch in range(args.epochs):
        m = trainer.run_epoch({"pixels": pixels, "labels": labels}, sampler,
                              epoch=epoch, rng=jax.random.key(9))
    print(f"[worker {jax.process_index()}] loss={float(m['loss']):.6f}",
          flush=True)

    if jax.process_index() == 0:
        w = trainer.state.params["head"]["fc1"]["w"]
        assert w.is_fully_replicated
        np.savez(args.out, loss=float(m["loss"]), w=np.asarray(w))
        print(f"[worker 0] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
