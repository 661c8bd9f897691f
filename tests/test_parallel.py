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
