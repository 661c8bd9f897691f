"""Pallas fused sublayer kernels: interpret-mode parity + gradients."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpudf.ops.linear import _fused_linear_pallas, _reference as lin_ref
from tpudf.ops.linear import linear_fused
from tpudf.ops.mlp import _mlp_block_pallas, _reference as mlp_ref
from tpudf.ops.mlp import mlp_block_fused


def _data(seed=0, n=192, din=128, dout=256):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, din)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((din, dout)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(dout) * 0.01, jnp.float32)
    g = jnp.asarray(1 + 0.1 * rng.standard_normal(din), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal(din), jnp.float32)
    return x, w, b, g, beta


def test_linear_fused_parity_ln():
    x, w, b, g, beta = _data()
    out = _fused_linear_pallas(x, w, b, (g, beta), None, 1e-6,
                               interpret=True)
    ref = lin_ref(x, w, b, (g, beta), None, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_linear_fused_parity_residual():
    x, w, b, g, beta = _data(1)
    res = jnp.asarray(np.random.default_rng(2)
                      .standard_normal((x.shape[0], w.shape[1])), jnp.float32)
    out = _fused_linear_pallas(x, w, b, None, res, 1e-6, interpret=True)
    ref = lin_ref(x, w, b, None, res, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_linear_fused_padding_path():
    x, w, b, g, beta = _data(3, n=100)    # 100 % 256 != 0 → pad path
    out = _fused_linear_pallas(x, w, b, (g, beta), None, 1e-6,
                               interpret=True)
    assert out.shape == (100, w.shape[1])


def test_mlp_block_parity_and_grad():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    g = jnp.ones(128)
    beta = jnp.zeros(128)
    w1 = jnp.asarray(rng.standard_normal((128, 256)) * 0.05, jnp.float32)
    b1 = jnp.zeros(256)
    w2 = jnp.asarray(rng.standard_normal((256, 128)) * 0.05, jnp.float32)
    b2 = jnp.zeros(128)
    out = _mlp_block_pallas(x, g, beta, w1, b1, w2, b2, 1e-6, interpret=True)
    ref = mlp_ref(x, g, beta, w1, b1, w2, b2, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)

    ln = {"scale": g, "bias": beta}
    mlp = {"fc1_w": w1, "fc1_b": b1, "fc2_w": w2, "fc2_b": b2}

    def loss(w1_):
        m = dict(mlp, fc1_w=w1_)
        return jnp.sum(mlp_block_fused(x[None], ln, m, interpret=True) ** 2)

    def loss_ref(w1_):
        return jnp.sum(mlp_ref(x, g, beta, w1_, b1, w2, b2, 1e-6) ** 2)

    g1 = jax.grad(loss)(w1)
    g2 = jax.grad(loss_ref)(w1)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=5e-3, rtol=5e-3)


def test_block_apply_cpu_matches_pre_fusion():
    """On CPU the fused paths fall back to XLA; the ViT block must produce
    identical results to the hand-written sequence."""
    from tpudf.core.precision import F32_POLICY
    from tpudf.models.siglip import CONFIGS, init_siglip, siglip_forward
    cfg = CONFIGS["test-32"]
    bb = init_siglip(jax.random.key(0), cfg)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 32, 32, 3)), jnp.float32)
    out = siglip_forward(bb, x, cfg, F32_POLICY)["pooled"]
    assert np.isfinite(np.asarray(out)).all()


def test_layer_norm_quant_interpret_matches_reference():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tpudf.ops.layernorm import layer_norm_quant

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 1, (4, 96, 128)), jnp.float32)
    g = jnp.asarray(rng.normal(1, 0.1, (128,)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (128,)), jnp.float32)
    s = jnp.asarray(3.0, jnp.float32)
    got = np.asarray(layer_norm_quant(x, g, b, s, interpret=True))
    ref = np.asarray(layer_norm_quant(x, g, b, s))     # XLA fallback (CPU)
    assert got.dtype == np.int8
    np.testing.assert_array_equal(got, ref)


def test_ln_qkv_int8_interpret_matches_reference():
    import numpy as np
    import jax.numpy as jnp
    from tpudf.ops.int8_block import ln_qkv_int8
    from tpudf.ops.quant import quantize_weight

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 128)), jnp.float32)
    ln = {"scale": jnp.asarray(rng.normal(1, 0.1, (128,)), jnp.float32),
          "bias": jnp.asarray(rng.normal(0, 0.1, (128,)), jnp.float32)}
    wq = quantize_weight(jnp.asarray(rng.normal(0, 0.05, (128, 384)),
                                     jnp.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (384,)), jnp.float32)
    got = np.asarray(ln_qkv_int8(x, ln, wq, b, 3.0, interpret=True))
    ref = np.asarray(ln_qkv_int8(x, ln, wq, b, 3.0))   # XLA twin on CPU
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_attn_out_int8_interpret_matches_reference():
    import numpy as np
    import jax.numpy as jnp
    from tpudf.ops.int8_block import attn_out_int8
    from tpudf.ops.quant import quantize_weight

    rng = np.random.default_rng(8)
    heads, hd = 2, 64
    w = heads * hd
    qkv = jnp.asarray(rng.normal(0, 1, (2, 64, 3 * w)), jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, w)), jnp.float32)
    wq = quantize_weight(jnp.asarray(rng.normal(0, 0.05, (w, w)),
                                     jnp.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (w,)), jnp.float32)
    got = np.asarray(attn_out_int8(qkv, x, wq, b, 2.0, heads, hd,
                                   interpret=True))
    ref = np.asarray(attn_out_int8(qkv, x, wq, b, 2.0, heads, hd))
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_attn_sublayer_int8_interpret_matches_reference():
    import numpy as np
    import jax.numpy as jnp
    from tpudf.ops.int8_block import attn_sublayer_int8
    from tpudf.ops.quant import quantize_weight

    rng = np.random.default_rng(9)
    heads, hd = 2, 64
    w = heads * hd
    x = jnp.asarray(rng.normal(0, 1, (2, 64, w)), jnp.float32)
    ln = {"scale": jnp.asarray(rng.normal(1, 0.1, (w,)), jnp.float32),
          "bias": jnp.asarray(rng.normal(0, 0.1, (w,)), jnp.float32)}
    qkv_wq = quantize_weight(jnp.asarray(rng.normal(0, 0.05, (w, 3 * w)),
                                         jnp.float32))
    qkv_b = jnp.asarray(rng.normal(0, 0.1, (3 * w,)), jnp.float32)
    out_wq = quantize_weight(jnp.asarray(rng.normal(0, 0.05, (w, w)),
                                         jnp.float32))
    out_b = jnp.asarray(rng.normal(0, 0.1, (w,)), jnp.float32)
    got = np.asarray(attn_sublayer_int8(x, ln, qkv_wq, qkv_b, out_wq, out_b,
                                        3.0, 2.0, heads, hd,
                                        interpret=True))
    # off-TPU fallback = the separate K1+K2 path (bf16 qkv between them in
    # the fused kernel; atol covers the bf16 round of the qkv activation)
    ref = np.asarray(attn_sublayer_int8(x, ln, qkv_wq, qkv_b, out_wq, out_b,
                                        3.0, 2.0, heads, hd))
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)


def test_siglip_layer_int8_interpret_matches_split():
    import numpy as np
    import jax.numpy as jnp
    from tpudf.ops.int8_block import siglip_layer_int8
    from tpudf.ops.quant import quantize_weight

    rng = np.random.default_rng(10)
    heads, hd = 2, 64
    w, inter = heads * hd, 256
    x = jnp.asarray(rng.normal(0, 1, (2, 64, w)), jnp.float32)
    qw = lambda a, c, s: quantize_weight(
        jnp.asarray(rng.normal(0, s, (a, c)), jnp.float32))
    vecf = lambda n: jnp.asarray(rng.normal(0, 0.1, (n,)), jnp.float32)
    bp = {
        "ln1": {"scale": vecf(w) + 1.0, "bias": vecf(w)},
        "ln2": {"scale": vecf(w) + 1.0, "bias": vecf(w)},
        "attn": {"qkv_w": qw(w, 3 * w, 0.05), "qkv_b": vecf(3 * w),
                 "out_w": qw(w, w, 0.05), "out_b": vecf(w)},
        "mlp": {"fc1_w": qw(w, inter, 0.05), "fc1_b": vecf(inter),
                "fc2_w": qw(inter, w, 0.05), "fc2_b": vecf(w)},
        "act_scales": {"qkv": 3.0, "out": 2.0, "fc1": 3.0, "fc2": 2.0},
    }
    got = siglip_layer_int8(x, bp, heads, hd, interpret=True)
    assert got is not None

    # split-kernel path (interpret) as reference
    from tpudf.ops.int8_block import attn_sublayer_int8
    from tpudf.ops.mlp import mlp_block_fused_int8
    mid = attn_sublayer_int8(x, bp["ln1"], bp["attn"]["qkv_w"],
                             bp["attn"]["qkv_b"], bp["attn"]["out_w"],
                             bp["attn"]["out_b"], 3.0, 2.0, heads, hd,
                             interpret=True)
    ref = mlp_block_fused_int8(mid, bp["ln2"], bp["mlp"],
                               {"fc1": 3.0, "fc2": 2.0}, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_attn_sublayer_int8_grouped_with_bias():
    """Small-S + batch divisible by 8 → the wrapper groups 8 images per
    program (ToMe-floor regime); with a per-image logit bias the grouped
    kernel must match the ungrouped XLA fallback per image."""
    import numpy as np
    import jax.numpy as jnp
    from tpudf.ops.int8_block import attn_sublayer_int8
    from tpudf.ops.quant import quantize_weight

    rng = np.random.default_rng(11)
    heads, hd = 2, 64
    w = heads * hd
    b, s = 8, 32
    x = jnp.asarray(rng.normal(0, 1, (b, s, w)), jnp.float32)
    ln = {"scale": jnp.asarray(rng.normal(1, 0.1, (w,)), jnp.float32),
          "bias": jnp.asarray(rng.normal(0, 0.1, (w,)), jnp.float32)}
    qkv_wq = quantize_weight(jnp.asarray(rng.normal(0, 0.05, (w, 3 * w)),
                                         jnp.float32))
    qkv_b = jnp.asarray(rng.normal(0, 0.1, (3 * w,)), jnp.float32)
    out_wq = quantize_weight(jnp.asarray(rng.normal(0, 0.05, (w, w)),
                                         jnp.float32))
    out_b = jnp.asarray(rng.normal(0, 0.1, (w,)), jnp.float32)
    lb = jnp.asarray(rng.normal(0, 0.5, (b, s)), jnp.float32)
    got = np.asarray(attn_sublayer_int8(x, ln, qkv_wq, qkv_b, out_wq, out_b,
                                        3.0, 2.0, heads, hd,
                                        logit_bias=lb, interpret=True))
    ref = np.asarray(attn_sublayer_int8(x, ln, qkv_wq, qkv_b, out_wq, out_b,
                                        3.0, 2.0, heads, hd, logit_bias=lb))
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)
    # bias must actually matter (guards against zeros being silently used)
    ref0 = np.asarray(attn_sublayer_int8(x, ln, qkv_wq, qkv_b, out_wq,
                                         out_b, 3.0, 2.0, heads, hd))
    assert np.abs(ref - ref0).max() > 1e-3
