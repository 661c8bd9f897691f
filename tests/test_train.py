"""Training-step tests: binary head, MTL (cls+seg), video — tiny configs.

The learning smoke tests mirror the reference's subset-smoke pattern
(SURVEY.md §4: `--subset_train "train[:5%]"`).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpudf.core.precision import F32_POLICY
from tpudf.models.heads import init_binary_head, init_video_head
from tpudf.models.segformer import MTLConfig, init_mtl, mtl_forward
from tpudf.models.siglip import CONFIGS, init_siglip
from tpudf.train.loops import EarlyStopper, LoopConfig, epoch_size_for, run_training
from tpudf.train.mtl import (apply_freeze, dynamic_loss_weights,
                             make_freeze_mask, make_mtl_train_step)
from tpudf.train.steps import (init_train_state, make_binary_train_step,
                               make_optimizer)
from tpudf.train.video import (auto_pos_weight, make_video_train_step,
                               VideoTrainState)

CFG = CONFIGS["test-32"]


def test_binary_head_learns_separable_data():
    """Head should fit a linearly separable frozen-feature problem."""
    backbone = init_siglip(jax.random.key(0), CFG)
    head = init_binary_head(jax.random.key(1), CFG.width)
    opt = make_optimizer(lr=3e-3, warmup_steps=2, total_steps=60)
    step = jax.jit(make_binary_train_step(CFG, opt, F32_POLICY))
    state = init_train_state(head, opt)

    rng = np.random.default_rng(0)
    # two visually distinct classes: dark vs bright images
    labels = (np.arange(16) % 2).astype(np.float32)
    pixels = np.where(labels[:, None, None, None] > 0,
                      rng.random((16, 32, 32, 3)) * 0.4 + 0.6,
                      rng.random((16, 32, 32, 3)) * 0.4).astype(np.float32)
    batch = {"pixels": jnp.asarray(pixels), "labels": jnp.asarray(labels)}
    losses = []
    for i in range(40):
        state, m = step(state, backbone, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8
    assert float(m["acc"]) >= 0.8


def test_mtl_step_runs_and_freezes():
    cfg = MTLConfig(backbone=CFG, seg_layers=(0, -1), embed_dim=32)
    params = init_mtl(jax.random.key(0), cfg)
    import optax
    opt = optax.adamw(1e-3)
    init_fn, step = make_mtl_train_step(cfg, opt, F32_POLICY, freeze_below=1,
                                        seg_loss="bce_dice")
    state = init_fn(params)
    b = 4
    batch = {
        "pixels": jnp.asarray(np.random.default_rng(0)
                              .random((b, 32, 32, 3), np.float32)),
        "cls": jnp.asarray([0, 1, 2, 2]),
        "mask": jnp.asarray((np.random.default_rng(1)
                             .random((b, 32, 32)) > 0.5).astype(np.float32)),
        "has_mask": jnp.asarray([0.0, 0.0, 1.0, 1.0]),
    }
    before = jax.tree.map(np.asarray, state.params)
    state, metrics = jax.jit(step)(state, batch, jax.random.key(0), 1.0, 0.5)
    after = state.params
    # frozen: patch embedding unchanged; layer 0 unchanged
    np.testing.assert_array_equal(
        before["backbone"]["embed"]["kernel"],
        np.asarray(after["backbone"]["embed"]["kernel"]))
    np.testing.assert_array_equal(
        before["backbone"]["blocks"]["mlp"]["fc1_w"][0],
        np.asarray(after["backbone"]["blocks"]["mlp"]["fc1_w"][0]))
    # trainable: layer 1 and decoder changed
    assert not np.allclose(
        before["backbone"]["blocks"]["mlp"]["fc1_w"][1],
        np.asarray(after["backbone"]["blocks"]["mlp"]["fc1_w"][1]))
    assert not np.allclose(before["cls_head"]["w"],
                           np.asarray(after["cls_head"]["w"]))
    assert np.isfinite(float(metrics["loss"]))


def test_mtl_seg_loss_only_on_masked():
    cfg = MTLConfig(backbone=CFG, seg_layers=(-1,), embed_dim=16)
    params = init_mtl(jax.random.key(0), cfg)
    cls_logits, seg_logits = mtl_forward(
        params, jnp.zeros((2, 32, 32, 3)), cfg, F32_POLICY)
    assert cls_logits.shape == (2, 3)
    assert seg_logits.shape == (2, 32, 32)


def test_video_train_step():
    backbone = init_siglip(jax.random.key(0), CFG)
    head = init_video_head(jax.random.key(1), CFG.width)
    opt = make_optimizer(lr=1e-3, total_steps=10)
    init_fn, step = make_video_train_step(CFG, opt, F32_POLICY,
                                          pos_weight=1.5)
    state = init_fn(head)
    batch = {
        "frames": jnp.asarray(np.random.default_rng(0)
                              .random((2, 3, 32, 32, 3), np.float32)),
        "labels": jnp.asarray([0.0, 1.0]),
    }
    state, m = jax.jit(step)(state, backbone, batch, jax.random.key(0))
    assert np.isfinite(float(m["loss"]))


def test_auto_pos_weight():
    assert auto_pos_weight([0, 0, 0, 1]) == 3.0


def test_dynamic_loss_weights_ramp():
    w0 = dynamic_loss_weights(0, 10)[1]
    w9 = dynamic_loss_weights(9, 10)[1]
    assert w9 > w0


def test_early_stopper_and_loop():
    st = EarlyStopper(patience=2, mode="max")
    assert st.update(0.5) and not st.update(0.4) and not st.update(0.3)
    assert st.should_stop

    vals = iter([0.5, 0.6, 0.55, 0.54, 0.53])
    hist = run_training(
        LoopConfig(epochs=5, patience=2, monitor="f1"),
        train_epoch_fn=lambda e: {"loss": 1.0 / (e + 1)},
        eval_epoch_fn=lambda e: {"f1": next(vals)},
        log_fn=lambda s: None)
    assert len(hist) == 4          # early-stopped after 2 non-improvements


def test_progressive_sizes():
    cfg = LoopConfig(epochs=6, progressive_sizes=(320, 384, 448))
    sizes = [epoch_size_for(cfg, e, 256) for e in range(6)]
    assert sizes == [320, 320, 384, 384, 448, 448]


def test_stop_grad_below_grads_match_and_prefix_zero():
    """stop_grad_below must be gradient-transparent for trainable layers:
    upper-block + head grads identical with/without the boundary, and the
    frozen prefix's grads exactly zero (XLA can then DCE its backward)."""
    from tpudf.train.mtl import mtl_loss_fn

    cfg = CONFIGS["test-32"]
    mcfg = MTLConfig(backbone=cfg, seg_layers=(0, 1), embed_dim=32)
    params = init_mtl(jax.random.key(0), mcfg)
    rng = np.random.default_rng(3)
    b = 2
    batch = {
        "pixels": jnp.asarray(rng.random((b, 32, 32, 3), np.float32)),
        "cls": jnp.asarray([0, 2], jnp.int32),
        "mask": jnp.asarray(rng.random((b, 32, 32)) > 0.5, jnp.float32),
        "has_mask": jnp.asarray([0.0, 1.0]),
    }
    k = 1   # freeze layer 0 of the 2-layer test tower

    def loss(p, sgb):
        out, _ = mtl_loss_fn(p, batch, mcfg, F32_POLICY, 1.0, 0.5,
                             seg_loss="bce_dice", stop_grad_below=sgb)
        return out

    g_plain = jax.grad(lambda p: loss(p, 0))(params)
    g_stop = jax.grad(lambda p: loss(p, k))(params)

    # frozen prefix: zero grads under the boundary
    blocks = g_stop["backbone"]["blocks"]
    for leaf in jax.tree.leaves(blocks):
        assert float(jnp.abs(leaf[:k]).max()) == 0.0

    # trainable part: grads numerically identical to the no-boundary run
    for name in ("cls_head", "decoder"):
        for a, b_ in zip(jax.tree.leaves(g_plain[name]),
                         jax.tree.leaves(g_stop[name])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-5, atol=1e-6)
    for a, b_ in zip(jax.tree.leaves(g_plain["backbone"]["blocks"]),
                     jax.tree.leaves(g_stop["backbone"]["blocks"])):
        np.testing.assert_allclose(np.asarray(a)[k:], np.asarray(b_)[k:],
                                   rtol=1e-5, atol=1e-6)


def test_mtl_int8_frozen_prefix():
    """frozen_q runs the frozen prefix on the W8A8 kernels inside the train
    step: frozen leaves stay exactly frozen, trainable leaves still move,
    the step differentiates cleanly (tangent severed before the int8 scan),
    and the trainable-parameter grads track the float-frozen path."""
    import optax

    from tpudf.train.mtl import mtl_loss_fn, quantize_frozen_prefix

    cfg = MTLConfig(backbone=CFG, seg_layers=(0, -1), embed_dim=32)
    params = init_mtl(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.random((4, 32, 32, 3), np.float32))
    fq = quantize_frozen_prefix(params, cfg, calib, F32_POLICY,
                                freeze_below=1)
    # sliced to the frozen prefix (1 of 2 layers), int8 weights
    assert fq["attn"]["qkv_w"]["q"].shape[0] == 1
    assert fq["attn"]["qkv_w"]["q"].dtype == jnp.int8

    opt = optax.adamw(1e-3)
    init_fn, step = make_mtl_train_step(cfg, opt, F32_POLICY,
                                        freeze_below=1,
                                        seg_loss="bce_dice", frozen_q=fq)
    state = init_fn(params)
    b = 4
    batch = {
        "pixels": jnp.asarray(rng.random((b, 32, 32, 3), np.float32)),
        "cls": jnp.asarray([0, 1, 2, 2]),
        "mask": jnp.asarray((rng.random((b, 32, 32)) > 0.5)
                            .astype(np.float32)),
        "has_mask": jnp.asarray([0.0, 0.0, 1.0, 1.0]),
    }
    before = jax.tree.map(np.asarray, state.params)
    state, metrics = jax.jit(step)(state, batch, jax.random.key(0), 1.0, 0.5)
    after = state.params
    np.testing.assert_array_equal(
        before["backbone"]["blocks"]["mlp"]["fc1_w"][0],
        np.asarray(after["backbone"]["blocks"]["mlp"]["fc1_w"][0]))
    assert not np.allclose(
        before["backbone"]["blocks"]["mlp"]["fc1_w"][1],
        np.asarray(after["backbone"]["blocks"]["mlp"]["fc1_w"][1]))
    assert np.isfinite(float(metrics["loss"]))

    # trainable grads with the int8 prefix track the float-frozen grads
    gf = jax.grad(lambda p: mtl_loss_fn(p, batch, cfg, F32_POLICY, 1.0,
                                        0.5, "bce_dice",
                                        stop_grad_below=1)[0])(params)
    gq = jax.grad(lambda p: mtl_loss_fn(p, batch, cfg, F32_POLICY, 1.0,
                                        0.5, "bce_dice", stop_grad_below=1,
                                        frozen_blocks_q=fq)[0])(params)
    a = np.asarray(gf["backbone"]["blocks"]["mlp"]["fc1_w"][1]).ravel()
    b2 = np.asarray(gq["backbone"]["blocks"]["mlp"]["fc1_w"][1]).ravel()
    corr = np.corrcoef(a, b2)[0, 1]
    assert corr > 0.95, corr


def test_binary_head_learns_on_deployed_features():
    """--int8_backbone --tome_r equivalent: the head must learn (and
    evaluate) on the deployed W8A8+ToMe serving features end to end."""
    from tpudf.ops.quant import (calibrate_siglip_act_scales,
                                 quantize_siglip_static)
    from tpudf.ops.tome import DEPLOYED_TOME_R, deployed_floor

    cfg = CONFIGS["test-64"]
    backbone = init_siglip(jax.random.key(0), cfg)
    head = init_binary_head(jax.random.key(1), cfg.width)
    rng = np.random.default_rng(0)
    labels = (np.arange(16) % 2).astype(np.float32)
    pixels = np.where(labels[:, None, None, None] > 0,
                      rng.random((16, 64, 64, 3)) * 0.4 + 0.6,
                      rng.random((16, 64, 64, 3)) * 0.4).astype(np.float32)
    batch = {"pixels": jnp.asarray(pixels), "labels": jnp.asarray(labels)}
    scales = calibrate_siglip_act_scales(backbone, cfg, batch["pixels"],
                                         F32_POLICY)
    bbq = quantize_siglip_static(backbone, scales, cfg)

    n_tok = (cfg.image_size // cfg.patch_size) ** 2
    opt = make_optimizer(lr=3e-3, warmup_steps=2, total_steps=60)
    step = jax.jit(make_binary_train_step(
        cfg, opt, F32_POLICY, tome_r=DEPLOYED_TOME_R,
        tome_floor=deployed_floor(n_tok)))
    state = init_train_state(head, opt)
    losses = []
    for i in range(40):
        state, m = step(state, bbq, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8
    assert float(m["acc"]) >= 0.8
