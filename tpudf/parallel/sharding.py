"""Parameter/batch sharding rules over the (data, model) mesh.

The reference never runs multi-device (SURVEY.md §2.4). tpudf's scale-out:
  * "data" axis — batch sharding for training and batch inference (the
    throughput axis; heads are tiny, backbone is frozen in most recipes)
  * "model" axis — Megatron-style tensor parallelism of the ViT blocks for
    the largest backbone (SO400M) or very large fused batches:
      - attention qkv projection sharded over output columns (heads split)
      - attention out projection sharded over input rows (psum after)
      - MLP fc1 sharded over columns, fc2 over rows (psum after)
    XLA inserts the all-reduces from the shardings — no hand-written
    collectives needed on this path.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpudf.core.mesh import DATA_AXIS, MODEL_AXIS


def siglip_param_spec(tensor_parallel: bool = True):
    """PartitionSpec pytree for a tpudf SigLIP param tree.

    Block leaves carry a leading stacked-layer axis (models/siglip.py), which
    stays unsharded; TP shards the matmul dims of qkv/out/mlp weights.
    """
    m = MODEL_AXIS if tensor_parallel else None
    blocks = {
        "ln1": {"scale": P(None, None), "bias": P(None, None)},
        "attn": {
            "qkv_w": P(None, None, m),      # (L, W, 3W) cols sharded
            "qkv_b": P(None, m),
            "out_w": P(None, m, None),      # (L, W, W) rows sharded
            "out_b": P(None, None),
        },
        "ln2": {"scale": P(None, None), "bias": P(None, None)},
        "mlp": {
            "fc1_w": P(None, None, m),      # (L, W, I)
            "fc1_b": P(None, m),
            "fc2_w": P(None, m, None),      # (L, I, W)
            "fc2_b": P(None, None),
        },
    }
    rep = P()
    head = {
        "probe": rep, "in_w": P(None, m), "in_b": P(m),
        "out_w": P(m, None), "out_b": rep,
        "ln": {"scale": rep, "bias": rep},
        "fc1_w": P(None, m), "fc1_b": P(m),
        "fc2_w": P(m, None), "fc2_b": rep,
    }
    return {
        "embed": {"kernel": rep, "bias": rep, "pos": rep},
        "blocks": blocks,
        "post_ln": {"scale": rep, "bias": rep},
        "head": head,
    }


def _prune_to(tree, like):
    """Keep only the keys present in `like` (e.g. headless param trees)."""
    if isinstance(like, dict):
        return {k: _prune_to(tree[k], v) for k, v in like.items()}
    return tree


def named_shardings(mesh: Mesh, spec_tree, params):
    spec_tree = _prune_to(spec_tree, params)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), spec_tree,
                        is_leaf=lambda x: isinstance(x, P))


def replicate_tree(mesh: Mesh, params):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), params)


def shard_siglip_params(mesh: Mesh, params, tensor_parallel=True):
    sh = named_shardings(mesh, siglip_param_spec(tensor_parallel), params)
    return jax.tree.map(jax.device_put, params, sh)


def batch_sharding(mesh: Mesh, ndim: int):
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
