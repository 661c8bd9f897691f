"""Small numeric helpers shared across heads."""

import jax
import jax.numpy as jnp


def mm(x, w):
    """f32-exact matmul. The expert heads are tiny (≤1024-dim) — their FLOPs
    are negligible next to the ViT, but the fused logit feeds CORAL
    calibration and the decision engine, so we force full float32 precision
    instead of the TPU default bf16 MXU pass."""
    return jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST)
