"""Precision policy for TPU execution.

The reference relies on CUDA AMP + TF32 (cifake_binary_classifier.py:10-29,
hidf_video_classifier.py:61-74). On TPU the idiomatic equivalent is: params and
optimizer state in float32, matmul/conv compute in bfloat16 (MXU-native), layer
norms and softmax accumulation in float32.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    # dtype used for numerically sensitive ops (LN, softmax, losses)
    accum_dtype: Any = jnp.float32

    def cast_compute(self, x):
        return jax.tree.map(lambda a: _cast(a, self.compute_dtype), x)

    def cast_accum(self, x):
        return jax.tree.map(lambda a: _cast(a, self.accum_dtype), x)


def _cast(a, dtype):
    if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
        return a.astype(dtype)
    return a


def cast_tree(tree, dtype):
    """Cast all floating leaves of a pytree to `dtype`."""
    return jax.tree.map(lambda a: _cast(a, dtype), tree)


DEFAULT_POLICY = Policy()
# Full-f32 policy for CPU-based parity tests.
F32_POLICY = Policy(compute_dtype=jnp.float32)
