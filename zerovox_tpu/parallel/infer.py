"""Sharded batched inference over a (data, model) mesh.

Two regimes, chosen by whether the mesh has a nontrivial "model" axis:

- **Pure DP** (model == 1): the whole pipeline runs inside `shard_map` over
  the data axis.  Each shard executes the complete local program — including
  the fused Pallas MRF kernels, which have no GSPMD partitioning rule and
  would otherwise force replication/all-gathers around the custom call —
  on its local batch slice with ZERO collectives.
- **TP** (model > 1): weights are channel-sharded (Megatron pairing,
  `sharding.param_partition_specs`) and GSPMD inserts the psum collectives.
  The vocoder is forced onto the XLA folded path, which GSPMD can
  partition; the Pallas kernel is per-device code and cannot span a
  channel-sharded activation.

Replaces the capability of ggml's multi-backend scheduler / RPC offload
(/root/reference/ggml/src/ggml-backend.cpp:631-1660, ggml-rpc.cpp:84-96)
with mesh-native data/tensor parallelism.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
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

    if not use_tp:
        return _make_dp_shard_map(cfg, mesh, params)

    # TP: GSPMD partitioning — the Pallas kernel has no partitioning rule,
    # so pin the vocoder to the XLA folded path (partitionable ops only).
    # This covers an explicit "pallas" too, not just "auto": under a
    # channel-sharded mesh the custom call cannot partition at all.
    if cfg.vocoder_backend in ("auto", "pallas"):
        if cfg.vocoder_backend == "pallas":
            import warnings
            warnings.warn(
                "vocoder_backend='pallas' is overridden to 'folded' under "
                "tensor parallelism: the fused kernel has no GSPMD "
                "partitioning rule (use time_shard_vocoder=True to keep it).",
                stacklevel=2)
        cfg = cfg.replace(vocoder_backend="folded")
    p_specs = param_partition_specs(params, cfg)

    def sh(spec):
        return NamedSharding(mesh, spec)

    params = jax.tree.map(lambda x, s: jax.device_put(x, sh(s)), params, p_specs)
    data = sh(P(DATA_AXIS))

    jitted = jax.jit(
        lambda p, src, pun, style, n: synthesize(
            p, cfg, src, pun, style, num_phonemes=n),
        in_shardings=(None, data, data, data, data),
    )
    return params, _with_default_n(jitted)


def _with_default_n(jitted):
    """num_phonemes=None -> full-length counts (the jitted fn always takes
    an array so batch shardings line up with the positional args)."""

    def fn(p, src, pun, style, n=None):
        if n is None:
            n = jnp.full((src.shape[0],), src.shape[1], jnp.int32)
        else:
            n = jnp.asarray(n, jnp.int32)
            if n.ndim == 0:
                n = jnp.broadcast_to(n, (src.shape[0],))
        return jitted(p, src, pun, style, n)

    return fn


def _make_dp_shard_map(cfg: ZeroVoxConfig, mesh: Mesh, params):
    """Pure-DP regime: full local pipeline per shard via shard_map."""
    shard_map = jax.shard_map

    p_specs = replicated_specs(params)
    params = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, p_specs)
    data = P(DATA_AXIS)
    rep = P()

    def local(p, src, pun, style, n):
        return synthesize(p, cfg, src, pun, style, num_phonemes=n)

    mapped = shard_map(
        local, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: rep, params), data, data, data, data),
        out_specs=data,
        check_vma=False,   # pallas_call has no varying-mesh-axes rule
    )
    return params, _with_default_n(jax.jit(mapped))
