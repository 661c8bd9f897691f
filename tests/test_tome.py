"""Token-merging (ops/tome.py) correctness + tower integration.

Oracle: a direct NumPy transcription of bipartite soft matching (ToMe,
Bolya et al. 2023) — merge the r most-similar A(even)->B(odd) pairs by
size-weighted averaging.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpudf.ops.tome import merge_schedule, merge_step


def _oracle_merge(x, sizes, r):
    b, s, w = x.shape
    outs, outsz = [], []
    for bi in range(b):
        xb = x[bi].astype(np.float64)
        sz = sizes[bi].astype(np.float64)
        xn = xb / (np.linalg.norm(xb, axis=-1, keepdims=True) + 1e-6)
        a_idx = np.arange(0, s, 2)
        b_idx = np.arange(1, s, 2)
        sim = xn[a_idx] @ xn[b_idx].T
        node_max = sim.max(1)
        node_idx = sim.argmax(1)
        merged_a = np.argsort(-node_max, kind="stable")[:r]
        rows = {j: [b_idx[j]] for j in range(len(b_idx))}
        for i in merged_a:
            rows[node_idx[i]].append(a_idx[i])
        kept_a = [i for i in range(len(a_idx)) if i not in set(merged_a)]
        groups = [rows[j] for j in range(len(b_idx))] + \
                 [[a_idx[i]] for i in kept_a]
        xo = np.stack([
            (xb[g] * sz[g][:, None]).sum(0) / sz[g].sum() for g in groups])
        so = np.array([sz[g].sum() for g in groups])
        outs.append(xo)
        outsz.append(so)
    return np.stack(outs), np.stack(outsz)


def test_merge_step_matches_oracle():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 8)).astype(np.float32)
    sizes = np.ones((2, 16), np.float32)
    xo, so = _oracle_merge(x, sizes, r=4)
    xj, sj = merge_step(jnp.asarray(x), jnp.asarray(sizes), 4)
    assert xj.shape == (2, 12, 8) and sj.shape == (2, 12)
    # top-k ties could reorder equal-similarity picks; random floats make
    # ties measure-zero
    np.testing.assert_allclose(np.asarray(xj), xo, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sj), so, atol=1e-5)


def test_merge_step_sizes_weighted():
    """Pre-existing sizes weight the average (second-round merges)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 4)).astype(np.float32)
    sizes = rng.uniform(1, 3, (1, 8)).astype(np.float32)
    xo, so = _oracle_merge(x, sizes, r=2)
    xj, sj = merge_step(jnp.asarray(x), jnp.asarray(sizes), 2)
    np.testing.assert_allclose(np.asarray(xj), xo, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sj), so, atol=1e-5)


def test_merge_schedule_floor():
    sched = merge_schedule(256, 12, 16, min_tokens=64)
    assert len(sched) == 11
    t = 256 - sum(sched)
    assert t >= 64
    assert all(r % 8 == 0 for r in sched)


def test_deployed_floor_schedule():
    """The deployed schedule (r=96, floor=S/8 — AUC-gated at real geometry,
    ops/tome.py header) reaches exactly 32 tokens at base-256 geometry in
    four gaps: 256→160→80→40→32."""
    from tpudf.ops.tome import DEPLOYED_TOME_R, deployed_floor

    floor = deployed_floor(256)
    assert floor == 32
    sched = merge_schedule(256, 12, DEPLOYED_TOME_R, min_tokens=floor)
    counts, t = [256], 256
    for r in sched:
        t -= r
        counts.append(t)
    assert counts[:5] == [256, 160, 80, 40, 32]
    assert min(counts) == 32
    assert deployed_floor(64) == 8      # test-geometry floor stays >= 8


def test_tower_tome_floor_plumbed():
    """tome_floor reaches merge_schedule: an explicit floor of 48 must stop
    merging above the default path's 32-token result (default floor 16 with
    the t//2-per-step cap binds at 32), so MORE tokens survive."""
    from tpudf.core.precision import DEFAULT_POLICY
    from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward

    cfg = CONFIGS["test-64"]   # 8x8 = 64 tokens, 2 layers -> one merge gap
    s = cfg.image_size
    params = init_siglip(jax.random.key(0), cfg)
    px = jax.random.uniform(jax.random.key(1), (1, s, s, 3)) * 2 - 1
    d = siglip_forward(params, px, cfg, DEFAULT_POLICY, tome_r=64)
    f = siglip_forward(params, px, cfg, DEFAULT_POLICY, tome_r=64,
                       tome_floor=48)
    assert d["sizes"].shape[1] == 32   # default floor 16; t//2 cap binds
    assert f["sizes"].shape[1] == 48   # explicit floor 48 binds first
    assert float(jnp.sum(f["sizes"])) == 64.0  # sizes still partition S


def test_identical_tokens_merge_is_exact():
    """All-identical tokens: merging must leave every surviving token equal
    to the original value, with sizes summing to S."""
    x = jnp.broadcast_to(jnp.asarray([1.0, -2.0, 0.5, 3.0]), (1, 16, 4))
    sizes = jnp.ones((1, 16), jnp.float32)
    xj, sj = merge_step(x, sizes, 4)
    np.testing.assert_allclose(np.asarray(xj),
                               np.broadcast_to([1.0, -2.0, 0.5, 3.0],
                                               (1, 12, 4)), atol=1e-6)
    assert float(jnp.sum(sj)) == 16.0


def test_tower_tome_pooled_close():
    """tome_r on the tower: pooled output stays directionally faithful to
    the exact forward even on a random-init tower (structured real features
    merge far more cleanly; this is the adversarial case)."""
    from tpudf.core.precision import DEFAULT_POLICY
    from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward

    cfg = CONFIGS["test-32"]
    params = init_siglip(jax.random.key(0), cfg)
    px = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3)) * 2 - 1
    full = siglip_forward(params, px, cfg, DEFAULT_POLICY)["pooled"]
    out = siglip_forward(params, px, cfg, DEFAULT_POLICY, tome_r=8)
    merged = out["pooled"]
    assert merged.shape == full.shape
    assert "sizes" in out
    cos = jnp.sum(full * merged, -1) / (
        jnp.linalg.norm(full, axis=-1) * jnp.linalg.norm(merged, axis=-1))
    assert float(jnp.min(cos)) > 0.90, float(jnp.min(cos))


def test_tome_rejects_training_modes():
    from tpudf.core.precision import DEFAULT_POLICY
    from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward

    cfg = CONFIGS["test-32"]
    params = init_siglip(jax.random.key(0), cfg)
    px = jnp.zeros((1, 32, 32, 3))
    with pytest.raises(ValueError):
        siglip_forward(params, px, cfg, DEFAULT_POLICY, tome_r=8,
                       output_hidden_states=True)
    with pytest.raises(ValueError):
        siglip_forward(params, px, cfg, DEFAULT_POLICY, tome_r=8,
                       stop_grad_below=3)
