"""GSPMD sharding rules for the zerovox parameter tree.

Tensor-parallel layout follows the Megatron pairing so that no resharding is
needed inside a block: the first projection of each pair is sharded on its
*output* channels, the second on its *input* channels (partial sums reduced by
an XLA-inserted psum over the "model" axis).  Instance norms reduce the time
axis per channel, so channel sharding keeps them collective-free; layer norms
reduce channels and gather.  Embeddings, biases of row-sharded layers, and all
small vectors are replicated.

Batch data-parallelism shards the leading axis of activations on "data".
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ZeroVoxConfig
from .mesh import DATA_AXIS, MODEL_AXIS


def _spec_for(path: tuple, shape: tuple, m: str) -> P:
    """TP PartitionSpec for one parameter (path in the pytree, our layout)."""
    section = path[0]
    leaf = path[-1]

    if section == "encoder":
        if path[1] == "layers":
            sub = path[3]
            if sub == "attn":
                # qkv col-parallel (heads sharded), out-proj row-parallel
                if leaf in ("wq", "wk", "wv"):
                    return P(None, m)
                if leaf in ("bq", "bk", "bv"):
                    return P(m)
                if leaf == "wo":
                    return P(m, None)
                return P(None)                     # bo, ln_g, ln_b
            # ffn: w1 col-parallel on hidden, w2 row-parallel
            if leaf == "w1":
                return P(None, None, m)
            if leaf == "b1":
                return P(m)
            if leaf == "w2":
                return P(None, m, None)
            return P(None)
        if leaf == "conv1_w":                      # variance predictors
            return P(None, None, m)
        if leaf in ("conv1_b",):
            return P(m)
        if leaf == "conv2_w":
            return P(None, m, None)
        return P(None)                             # embeddings, norms, linear

    if section == "decoder":
        if leaf == "conv1_w":
            return P(None, None, m)
        if leaf == "conv1_b":
            return P(m)
        if leaf == "conv2_w":
            return P(None, m, None)
        return P(None)

    if section == "vocoder":
        # channels shrink toward the waveform; shard only where they are wide
        if leaf in ("w", "conv1_w") and len(shape) == 3 and shape[2] >= 64:
            return P(None, None, m)
        if leaf in ("input_conv_w",) and shape[2] >= 64:
            return P(None, None, m)
        if leaf == "input_conv_b" and shape[0] >= 64:
            return P(m)
        return P(None)

    return P(None)


def param_partition_specs(params: Dict[str, Any], cfg: ZeroVoxConfig,
                          model_axis: str = MODEL_AXIS):
    """Pytree of PartitionSpec mirroring the params tree."""
    specs = {}

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, path + (i,)) for i, v in enumerate(node)]
        return _spec_for(path, node.shape, model_axis)

    return walk(params, ())


def replicated_specs(params):
    return jax.tree.map(lambda _: P(), params)


def shard_params(params, mesh: Mesh, specs=None, cfg: ZeroVoxConfig = None):
    """device_put the param tree with NamedShardings on `mesh`."""
    if specs is None:
        specs = (param_partition_specs(params, cfg) if mesh.shape.get(MODEL_AXIS, 1) > 1
                 else replicated_specs(params))
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)))


def batch_specs(n_leading_batch_axes: int = 1):
    """PartitionSpec for batched activations: leading axis on 'data'."""
    return P(DATA_AXIS)


def shard_batch(batch, mesh: Mesh):
    s = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
