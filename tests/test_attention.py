"""Pallas fused attention vs XLA reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpudf.ops.attention import attention, attention_reference, _attention_pallas


@pytest.mark.parametrize("b,h,s,d", [
    (1, 2, 256, 64),
    (2, 4, 576, 64),     # 384px/16 SigLIP-L geometry
    (1, 2, 100, 64),     # non-aligned seq → padding/mask path
    (1, 2, 1024, 72),    # so400m head_dim=72 (non-128 last dim)
])
def test_pallas_matches_reference(b, h, s, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    ref = attention_reference(q, k, v)
    out = _attention_pallas(q, k, v, d ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("s,h,d", [
    (256, 12, 64),     # base-256
    (576, 16, 64),     # large-384 (q axis padded to the q-block multiple)
    (1024, 16, 72),    # so400m-512 raw head dim
    (256, 4, 128),     # lane-aligned fori-loop head path (padded so400m)
])
def test_qkv_fused_matches_reference(s, h, d):
    from tpudf.ops.attention import _attention_qkv_pallas, _reference_qkv
    w = h * d
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((1, s, 3 * w)), jnp.float32)
    ref = _reference_qkv(qkv, h, d, d ** -0.5)
    out = _attention_qkv_pallas(qkv, h, d, d ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


def test_qkv_fused_grad_flows():
    from tpudf.ops.attention import attention_qkv
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.standard_normal((1, 64, 3 * 64)), jnp.float32)

    def loss(t):
        return jnp.sum(attention_qkv(t, 2, 32, interpret=True) ** 2)

    g = jax.grad(loss)(qkv)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_pallas_grad_flows():
    """Attention participates in head-training graphs; make sure the padded
    kernel is differentiable (interpret mode on CPU)."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, 64, 32)), jnp.float32)

    def loss(q):
        o = attention(q, q, q, interpret=True)
        return jnp.sum(o ** 2)

    g = jax.grad(loss)(q)
    def loss_ref(q):
        return jnp.sum(attention_reference(q, q, q) ** 2)
    g_ref = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_qkv_pallas_backward_matches_xla():
    """The Pallas bwd kernel must match the XLA-recompute VJP."""
    import jax
    import jax.numpy as jnp
    from tpudf.ops.attention import (_attention_qkv_bwd_pallas,
                                     _reference_qkv)

    rng = np.random.default_rng(12)
    b, s, heads, hd = 2, 64, 2, 64
    w = heads * hd
    qkv = jnp.asarray(rng.normal(0, 1, (b, s, 3 * w)), jnp.float32)
    g = jnp.asarray(rng.normal(0, 1, (b, s, w)), jnp.float32)
    scale = hd ** -0.5

    _, vjp = jax.vjp(lambda t: _reference_qkv(t, heads, hd, scale), qkv)
    (ref,) = vjp(g)
    got = _attention_qkv_bwd_pallas(qkv, g, heads, hd, scale,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_fused_qkv_grad_through_dispatch():
    """jax.grad through attention_qkv (interpret → Pallas fwd+bwd) matches
    grad through the pure XLA reference."""
    import jax
    import jax.numpy as jnp
    from tpudf.ops.attention import attention_qkv, _reference_qkv

    rng = np.random.default_rng(13)
    b, s, heads, hd = 2, 64, 2, 64
    qkv = jnp.asarray(rng.normal(0, 1, (b, s, 3 * heads * hd)), jnp.float32)

    f_pallas = lambda t: jnp.sum(jnp.sin(
        attention_qkv(t, heads, hd, interpret=True)))
    f_ref = lambda t: jnp.sum(jnp.sin(_reference_qkv(
        t, heads, hd, hd ** -0.5)))
    np.testing.assert_allclose(np.asarray(jax.grad(f_pallas)(qkv)),
                               np.asarray(jax.grad(f_ref)(qkv)),
                               atol=2e-3, rtol=2e-3)


def test_int8_attention_close_to_float():
    """Dynamic int8 QK^T/AV (int8_attn=True) must track the float kernel —
    scores quantized per-head-tile by amax, probs by the exact 1/127 scale.
    Used by the static-int8 tower's long-sequence path (TPUDF_INT8_ATTN)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tpudf.ops.attention import attention_qkv

    heads, d = 2, 128
    w = heads * d
    qkv = jax.random.normal(jax.random.key(0), (2, 128, 3 * w),
                            jnp.float32) * 0.5
    ref = np.asarray(attention_qkv(qkv, heads, d, use_pallas=False))
    got = np.asarray(attention_qkv(qkv, heads, d, interpret=True,
                                   int8_attn=True))
    # int8 quantization error budget: ~1% relative on the attention output
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.02, err
    # and the mean must be essentially unbiased
    assert abs(float(got.mean() - ref.mean())) < 1e-3
