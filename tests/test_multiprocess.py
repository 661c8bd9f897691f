"""Multi-PROCESS execution smoke (r4 verdict next #3): the multi-host
training story must be executably true, not just virtually-meshed. Spawns
2 REAL processes via tpudf.cli.launch (jax.distributed + local TCP
coordinator, 4 virtual CPU devices each → one 8-device global mesh, gloo
cross-process collectives) driving HostShardedSampler +
global_batch_from_host_shards + ShardedTrainer, then asserts the
trajectory equals the single-process 8-device run of the same global
batches (the in-process conftest mesh)."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mp_result(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mp") / "mp.npz")
    env = os.environ.copy()
    # children must NOT inherit this test session's 8-device CPU pin; the
    # launcher sets its own topology (2 procs x 4 devices)
    cmd = [sys.executable, "-m", "tpudf.cli.launch", "--nprocs", "2",
           "--cpu_devices", "4", "--",
           sys.executable, os.path.join(_repo, "tests", "_mp_worker.py"),
           "--out", out]
    r = subprocess.run(cmd, cwd=_repo, env=env, capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, f"launcher failed:\n{r.stdout[-4000:]}"
    assert os.path.exists(out), r.stdout[-2000:]
    assert "[worker 0]" in r.stdout and "[worker 1]" in r.stdout
    return np.load(out)


def test_two_process_trainer_matches_single_process(mp_result):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from tpudf.core.mesh import make_mesh
    from tpudf.core.precision import F32_POLICY
    from tpudf.models.heads import init_binary_head
    from tpudf.models.siglip import CONFIGS, init_siglip
    from tpudf.parallel.hostdata import HostShardedSampler
    from tpudf.parallel.training import ShardedTrainer
    from tpudf.train.steps import make_binary_train_step, make_optimizer

    CFG = CONFIGS["test-32"]
    rng = np.random.default_rng(0)
    n, gb, s = 16, 8, 32
    pixels = rng.random((n, s, s, 3)).astype(np.float32)
    labels = (np.arange(n) % 2).astype(np.float32)

    bb = init_siglip(jax.random.key(3), CFG)
    head = init_binary_head(jax.random.key(4), CFG.width)
    opt = make_optimizer(lr=1e-3, total_steps=8, grad_clip=1.0)
    step = make_binary_train_step(CFG, opt, policy=F32_POLICY,
                                  train_backbone=True)
    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    trainer = ShardedTrainer(mesh, step, opt,
                             {"backbone": bb, "head": head})
    sampler = HostShardedSampler(n, gb, seed=1, process_index=0,
                                 process_count=1)
    m = trainer.run_epoch({"pixels": pixels, "labels": labels}, sampler,
                          epoch=0, rng=jax.random.key(9))

    np.testing.assert_allclose(float(mp_result["loss"]), float(m["loss"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        mp_result["w"], np.asarray(trainer.state.params["head"]["fc1"]["w"]),
        atol=2e-4, rtol=2e-4)
