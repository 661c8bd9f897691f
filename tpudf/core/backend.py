"""Shared backend probe for kernel dispatch.

Every Pallas kernel / MXU-specific formulation gates on this instead of a
per-module copy, so a future change (treating another platform as
TPU-like, or an env override for testing) happens in exactly one place.
"""

from __future__ import annotations

import os


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU. TPUDF_FORCE_TPU_PATHS=1
    overrides (useful for exercising TPU-gated code under interpret mode)."""
    if os.environ.get("TPUDF_FORCE_TPU_PATHS") == "1":
        return True
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
