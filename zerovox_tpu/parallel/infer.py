"""Sharded batched inference: pjit'd synthesize over a (data, model) mesh."""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ZeroVoxConfig
from ..models.pipeline import synthesize
from .mesh import DATA_AXIS, MODEL_AXIS
from .sharding import param_partition_specs, replicated_specs


def make_sharded_synthesize(cfg: ZeroVoxConfig, mesh: Mesh, params,
                            use_tp: Optional[bool] = None):
    """Returns (sharded_params, step_fn(params, src, puncts, style, num_phonemes)).

    Batch rides the "data" axis; with use_tp (default: when the mesh has a
    nontrivial "model" axis) weights are channel-sharded and XLA inserts the
    TP collectives over ICI.
    """
    if use_tp is None:
        use_tp = mesh.shape.get(MODEL_AXIS, 1) > 1
    p_specs = param_partition_specs(params, cfg) if use_tp else replicated_specs(params)

    def sh(spec):
        return NamedSharding(mesh, spec)

    params = jax.tree.map(lambda x, s: jax.device_put(x, sh(s)), params, p_specs)
    data = sh(P(DATA_AXIS))

    fn = jax.jit(
        lambda p, src, pun, style, n=None: synthesize(
            p, cfg, src, pun, style, num_phonemes=n),
        in_shardings=(None, data, data, data, data),
    )
    return params, fn
