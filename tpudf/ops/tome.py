"""Token merging (ToMe) for the SigLIP tower — TPU-native formulation.

Published technique: "Token Merging: Your ViT But Faster" (Bolya et al.,
ICLR 2023) — progressively merge the r most similar token pairs per layer
via bipartite soft matching. Off-the-shelf (no retraining) it trades <1%
classification accuracy for ~1.5-2x ViT throughput; for the frozen-backbone
deepfake heads the end-task effect is validated by tests
(tests/test_tome.py AUC-delta) rather than assumed.

TPU-first design decisions (vs the reference CUDA/torch world, where ToMe
uses gather/scatter):
  * The merge is ONE one-hot matmul on the MXU: every token gets a
    destination row, x' = onehot(assign)^T @ (x * size) row-normalized.
    No scatter (serial on TPU), no dynamic shapes — r is static per layer,
    so every layer's token count is a compile-time constant.
  * Similarity uses the post-block features (merge-between-layers), keeping
    the fused int8 block kernels (ops/int8_block.py) untouched; they simply
    see a smaller static S each layer.
  * Proportional attention (softmax logits += log size_k, ToMe §3) is
    carried as an additive row bias into the attention kernels.

The reference has no counterpart (its ViT calls are stock open_clip,
appv3.py:1223); this is a pure speed lever for the >=5x/chip target.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Deployed merge schedule for the serving engine / bench path. Measured on
# the v5e at base-256 (B=256, int8 tower, structured images —
# scripts/bench_tome.py and scripts/bench_tome_floor.py; pooled-feature
# cosine vs the exact bf16 full-token tower):
#
#     r=64  floor=64 (S/4): 12,780 img/s  cos 0.9971 mean / 0.9956 min
#     r=64  floor=32 (S/8): 15,563 img/s  cos 0.9966 mean / 0.9948 min
#     r=96  floor=32      : 17,580 img/s  cos 0.9945 mean / 0.9912 min  <- deployed (r5)
#     r=128 floor=32      : 18,893 img/s  cos 0.9923 mean / 0.9883 min
#
# r=96 was promoted from "parked on cosine" to deployed by an END-TASK
# gate at REAL base-256 geometry (r4 verdict next #1/#5,
# scripts/cert_geometry.py on the chip: random-init tower, frozen
# features, procedural token-level discrimination, n_val=384, 2 seeds x 2
# difficulty levels): worst-case |ΔAUC| vs float = 0.0073 — far inside
# the 0.02 single-mode / 0.03 int8-combined gates — for both a
# float-trained head (train/serve mismatched) and a matched-trained head.
# The same gate re-run at ViT-L-384 geometry (the reference's production
# backbone, 576 tokens / floor 72): r=96 -0.0008, int8+r=96 -0.0022,
# matched -0.0037 — all inside the gate there too.
# r=128 measures within the gate too (worst 0.0050) but sits past the
# cosine knee for only +7% more; parked. End-task AUC is also pinned at
# toy geometry every CI run by tests/test_train_infer_e2e.py and at real
# geometry by tests/test_deployed_geometry.py; r=32 'conservative' with
# the legacy S/4 floor stays certified for accuracy-sensitive callers
# (cli/infer --tome_r 32). The schedule clips per-geometry (never below
# the floor and never more than half the tokens per gap), so the same
# constants are safe at every image size.
DEPLOYED_TOME_R = 96
DEPLOYED_TOME_FLOOR_DIV = 8      # deployed token floor = n_tokens // 8
CONSERVATIVE_TOME_R = 32


def deployed_floor(n_tokens: int) -> int:
    """Deployed token floor for a tower that starts at n_tokens (base-256:
    256 // 8 = 32). Floors below 8 are never useful (lane granularity)."""
    return max(8, n_tokens // DEPLOYED_TOME_FLOOR_DIV)


# Patch-grid views of the full-analysis path (serve/engine._detect_batch):
# each tile is a PATCH_GRID-fold linearly-upscaled crop, so its token
# redundancy is ~grid^2 higher than a natural image's — the deployed patch
# schedule merges twice as fast to a twice-deeper floor. Fidelity bounded
# by tests/test_patch_tome.py (patch-signal agreement + end-task deltas).
DEPLOYED_PATCH_TOME_R = 128
DEPLOYED_PATCH_FLOOR_DIV = 16


def deployed_patch_floor(n_tokens: int) -> int:
    return max(8, n_tokens // DEPLOYED_PATCH_FLOOR_DIV)


def merge_schedule(n_tokens: int, layers: int, r: int,
                   min_tokens: int = 64) -> tuple[int, ...]:
    """Per-gap merge counts: r tokens merged after each of the first
    layers-1 blocks (never after the last — nothing downstream to save),
    clipped so the token count never drops below min_tokens and stays
    lane-friendly (multiples of 8)."""
    rs = []
    t = n_tokens
    for _ in range(max(0, layers - 1)):
        # bipartite matching can merge at most the whole A set (t // 2)
        ri = min(r, max(0, t - min_tokens), t // 2)
        ri -= ri % 8                     # keep S % 8 == 0 for the kernels
        rs.append(ri)
        t -= ri
    return tuple(rs)


def merge_step(x, sizes, r: int, sumsq=None):
    """One bipartite-soft-matching merge: (B, S, W), (B, S) → (B, S-r, W),
    (B, S-r).

    sumsq: optional (B, S) per-row sum-of-squares of x — when the
    preceding block's fused kernel emits it from its epilogue
    (ops/mlp.mlp_block_fused_int8 emit_sumsq), the separate full-tensor
    norm pass below is skipped.

    Tokens at even positions form set A, odd positions set B. Each A token
    is matched to its most similar B token (cosine over features); the r
    best-matched A tokens are averaged (size-weighted) into their partners.
    Surviving order: all B tokens first, then kept A tokens in position
    order (static shapes; pooled MAP head is order-invariant).
    """
    b, s, w = x.shape
    if r <= 0:
        return x, sizes
    sp = s - r                                   # tokens after merge
    ha = (s + 1) // 2                            # A = even positions
    f32 = jnp.float32

    # Cosine similarity WITHOUT materialising a normalized copy of x
    # (writing the (B, S, W) normalized tensor cost ~0.4 ms of the
    # ~0.85 ms sim stage at S=256 — scripts/micro_tome_profile.py): take
    # raw bf16 dot products with f32 accumulation, then scale the small
    # (B, ha, hb) matrix by the inverse row/col norms. bf16 inputs run at
    # 4x the f32 MXU rate, and ~1e-3 relative score error cannot disturb
    # an argmax/top-k RANKING of cosine similarities except between pairs
    # that are equal-quality merge candidates anyway.
    x16 = x.astype(jnp.bfloat16)
    if sumsq is None:
        sumsq = jnp.sum(x.astype(f32) ** 2, axis=-1)         # (B, S)
    inv = jax.lax.rsqrt(sumsq.astype(f32) + 1e-12)
    na, nb = x16[:, 0::2], x16[:, 1::2]
    sim = jnp.einsum("bif,bjf->bij", na, nb,
                     preferred_element_type=f32)  # (B, ha, hb)
    sim = sim * inv[:, 0::2, None] * inv[:, None, 1::2]
    node_max = jnp.max(sim, axis=-1)             # (B, ha)
    node_idx = jnp.argmax(sim, axis=-1)          # (B, ha) partner in B

    # r most-similar A tokens get merged
    _, top_idx = jax.lax.top_k(node_max, r)      # (B, r)
    merged = jnp.sum(jax.nn.one_hot(top_idx, ha, dtype=f32), axis=1) > 0.5

    # destination row for every original token:
    #   B token j           -> row j                     (rows 0..hb-1)
    #   merged A token i    -> row node_idx[i]
    #   kept A token i      -> row hb + rank_among_kept(i)
    hb = s - ha
    kept = ~merged                                        # (B, ha)
    rank = jnp.cumsum(kept.astype(jnp.int32), axis=-1) - 1
    row_a = jnp.where(merged, node_idx, hb + rank)        # (B, ha)
    row_b = jnp.broadcast_to(jnp.arange(hb), (b, hb))
    if ha == hb:                                          # even S (all real
        # interleave by stack+reshape — no scatter        #  tower geometries)
        assign = jnp.stack([row_a, row_b], axis=2).reshape(b, s)
    else:
        assign = jnp.zeros((b, s), jnp.int32)
        assign = assign.at[:, 0::2].set(row_a)
        assign = assign.at[:, 1::2].set(row_b)

    # one-hot merge matrix applied as a single MXU matmul (no scatter):
    # columns = original tokens, rows = surviving tokens
    onehot = (assign[:, :, None] ==
              jnp.arange(sp)[None, None, :]).astype(x.dtype)   # (B, S, S')
    sz = sizes.astype(x.dtype)
    num = jnp.einsum("bsp,bsw->bpw", onehot, x * sz[..., None],
                     preferred_element_type=f32)
    den = jnp.einsum("bsp,bs->bp", onehot, sz,
                     preferred_element_type=f32)
    x_out = (num / den[..., None]).astype(x.dtype)
    return x_out, den


