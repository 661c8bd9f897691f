"""Probe: can STATIC-scale int8 attention flip the so400m int8<bf16
inversion (README: dynamic per-tile amax is VPU-bound, 127 vs 147 img/s)?

Times the attention sublayer alone at the two long-sequence geometries
(so400m-512 lane-padded: S=1024 D=128 W=2048; large-384: S=576 D=64
W=1024) in three modes: bf16, dynamic-int8 (shipped TPUDF_INT8_ATTN), and
static-int8 with closure-constant scales (amax reductions deleted — the
BEST CASE for static calibration; real plumbing would pass per-head scale
vectors). If static still loses to bf16, the inversion is not an amax
problem and the dynamic path stays parked.
"""
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path[:0] = [os.path.dirname(_here), _here]

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from _slope import slope

import tpudf.ops.attention as A
from tpudf.ops.attention import _attention_qkv_pallas


def static_variant():
    """Monkey-style copy of _attention_qkv_pallas's _one_head with fixed
    scales: reuse the module kernel but patch amax computations away by
    binding scales via globals — simplest honest probe: re-implement
    _one_head inline here with constants."""
    import functools
    from jax.experimental import pallas as pl

    def build(heads, head_dim, scale, aq=3.0, ak=3.0, av=3.0, q_block=256):
        def _one_head(qh, kh, vh):
            q8 = jnp.clip(jnp.round(qh.astype(jnp.float32) * (127.0 / aq)),
                          -127, 127).astype(jnp.int8)
            k8 = jnp.clip(jnp.round(kh.astype(jnp.float32) * (127.0 / ak)),
                          -127, 127).astype(jnp.int8)
            sc = jax.lax.dot_general(
                q8, k8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * ((aq * ak) / (127.0 * 127.0) * scale)
            m = jnp.max(sc, axis=-1, keepdims=True)
            e = jnp.exp(sc - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            ap = jnp.max(p, axis=-1, keepdims=True) + 1e-20
            p8 = jnp.round(p * (127.0 / ap)).astype(jnp.int8)
            v8 = jnp.clip(jnp.round(vh.astype(jnp.float32) * (127.0 / av)),
                          -127, 127).astype(jnp.int8)
            return jax.lax.dot_general(
                p8, v8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (ap * (av / (127.0 * 127.0)))

        def fn(qkv):
            b, s, w3 = qkv.shape
            w = w3 // 3
            qb = min(q_block, s)
            sp = ((s + qb - 1) // qb) * qb
            qkv_q = jnp.pad(qkv, ((0, 0), (0, sp - s), (0, 0))) if sp != s else qkv
            ngroups = 1
            cand = 1
            while cand <= heads:
                valid = heads % cand == 0 and w % cand == 0 and (w // cand) % 128 == 0
                if valid:
                    ngroups = cand
                    if s * (w // cand) * 2 * 4 <= 8 * 1024 * 1024:
                        break
                cand *= 2
            gw = w // ngroups
            gheads = heads // ngroups

            def kernel(q_ref, k_ref, v_ref, o_ref):
                def body(h, _):
                    lo = pl.multiple_of(h * head_dim, 128)
                    qh = q_ref[0, :, pl.ds(lo, head_dim)]
                    kh = k_ref[0, :, pl.ds(lo, head_dim)]
                    vh = v_ref[0, :, pl.ds(lo, head_dim)]
                    o_ref[0, :, pl.ds(lo, head_dim)] = \
                        _one_head(qh, kh, vh).astype(o_ref.dtype)
                    return 0
                jax.lax.fori_loop(0, gheads, body, 0)

            out = pl.pallas_call(
                kernel,
                grid=(b, sp // qb, ngroups),
                in_specs=[
                    pl.BlockSpec((1, qb, gw), lambda i, j, g: (i, j, g)),
                    pl.BlockSpec((1, s, gw), lambda i, j, g: (i, 0, ngroups + g)),
                    pl.BlockSpec((1, s, gw), lambda i, j, g: (i, 0, 2 * ngroups + g)),
                ],
                out_specs=pl.BlockSpec((1, qb, gw), lambda i, j, g: (i, j, g)),
                out_shape=jax.ShapeDtypeStruct((b, sp, w), qkv.dtype),
            )(qkv_q, qkv, qkv)
            return out[:, :s] if sp != s else out
        return fn
    return build


def main():
    build_static = static_variant()
    for name, b, s, w, d in (("so400m-pad", 8, 1024, 2048, 128),
                             ("large-384", 16, 576, 1024, 64)):
        heads = w // d
        scale = d ** -0.5
        qkv = jax.random.normal(jax.random.key(0), (b, s, 3 * w),
                                jnp.bfloat16)
        rows = [
            ("bf16", lambda x: _attention_qkv_pallas(x, heads, d, scale)),
            ("dyn-int8", lambda x: _attention_qkv_pallas(
                x, heads, d, scale, int8_attn=True)),
        ]
        if d % 128 == 0:
            rows.append(("static-int8", build_static(heads, d, scale)))
        for mode, fn in rows:
            dt = slope(fn, qkv, lo=16, hi=64, reps=3)
            print(f"{name:11s} {mode:12s} {dt * 1e3:7.3f} ms "
                  f"({b / dt:8.1f} img/s-equiv)")


if __name__ == "__main__":
    main()
