"""Worker process for the real multi-process jax.distributed test.

Launched by tests/test_distributed_multiproc.py — two copies of this
script form a 2-process x 4-virtual-CPU-device "pod" (8 global devices)
over a localhost TCP coordinator with gloo cross-process collectives.
This executes the code path the reference's ggml-rpc backend serves
(/root/reference/ggml/src/ggml-rpc/ggml-rpc.cpp:84-96 — remote tensors
over a socket), the TPU-native way: one SPMD program, collectives over
the wire, no tensor shipping.

Protocol with the launcher: coordinator/process-count/process-id arrive
via the standard JAX_* env vars (exercising initialize_distributed's
env-default path); results are printed as "CHECK <name> <value>" lines
the launcher diffs across both processes.
"""

import os
import sys

# 4 virtual CPU devices per process, BEFORE jax import; the launcher's
# env (conftest's 8-device XLA_FLAGS) must not leak in
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main() -> int:
    from zerovox_tpu.parallel.distributed import (initialize_distributed,
                                                  make_pod_mesh)

    # env-default path: JAX_COORDINATOR_ADDRESS / _NUM_PROCESSES / _PROCESS_ID
    assert initialize_distributed() is True
    pid = jax.process_index()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    mesh = make_pod_mesh(hosts=2, model=2)
    # the layout guarantee: every model-axis group lives on ONE process,
    # so TP collectives never cross the (slow) inter-host link
    for row in mesh.devices:
        procs = {d.process_index for d in row}
        assert len(procs) == 1, f"model group spans processes: {row}"

    # exact cross-process reduction: each process contributes a distinct
    # local shard; the jitted sum must see all of them
    local = np.arange(8, dtype=np.float32).reshape(4, 2) + 100.0 * pid
    glob = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), local)
    total = float(jax.jit(lambda x: jnp.sum(x * 2.0))(glob))
    expect = 2.0 * (np.arange(8, dtype=np.float64).sum() * 2 + 100.0 * 8)
    assert total == expect, (total, expect)
    print(f"CHECK reduction {total}", flush=True)

    # one real sharded train step at TINY geometry over the pod mesh:
    # batch DP across the two processes (gloo grad psum over TCP),
    # channel TP within each process
    from zerovox_tpu.config import TINY_CONFIG
    from zerovox_tpu.params import init_params
    from zerovox_tpu.parallel import shard_batch
    from zerovox_tpu.training import TrainBatch, make_sharded_train_step

    cfg = TINY_CONFIG
    rng = np.random.default_rng(0)  # identical batch on both processes
    B, Pn = 8, cfg.max_n_phonemes
    batch = TrainBatch(
        src_seq=jnp.asarray(rng.integers(0, cfg.num_phonemes + 1, (B, Pn)),
                            dtype=jnp.int32),
        puncts=jnp.asarray(rng.integers(0, cfg.num_puncts + 1, (B, Pn)),
                           dtype=jnp.int32),
        style_embed=jnp.asarray(
            rng.normal(scale=0.1, size=(B, cfg.d_model)), dtype=jnp.float32),
        num_phonemes=jnp.full((B,), Pn, dtype=jnp.int32),
        durations=jnp.asarray(rng.integers(1, 4, (B, Pn)), dtype=jnp.int32),
        mel_target=jnp.asarray(
            rng.normal(size=(B, cfg.max_seq_len, cfg.num_mels)),
            dtype=jnp.float32),
        wav_target=jnp.asarray(
            rng.normal(scale=0.1, size=(B, cfg.wav_len)), dtype=jnp.float32),
    )

    params = init_params(cfg, seed=1)
    state, step = make_sharded_train_step(
        cfg, mesh, params,
        stft_resolutions=((256, 30, 120), (128, 15, 60)))
    host_batch = TrainBatch(*(np.asarray(x) for x in batch))
    batch = shard_batch(batch, mesh)

    state, losses = step(state, batch)
    loss = float(losses["total"])
    assert np.isfinite(loss)
    assert int(state.step) == 1
    print(f"CHECK train_loss {loss:.10f}", flush=True)

    # multi-process INFERENCE — the actual job the reference's ggml-rpc
    # offload transport exists for, done the SPMD way: pure-DP shard_map
    # over all 8 devices, each process vocoding its local batch shards
    from zerovox_tpu.models.pipeline import synthesize
    from zerovox_tpu.parallel import make_pod_mesh as _pm, make_mesh  # noqa: F401
    from zerovox_tpu.parallel.infer import make_sharded_synthesize

    dp_mesh = make_pod_mesh(hosts=2, model=1)
    sparams, fn = make_sharded_synthesize(cfg, dp_mesh, params)
    out = fn(sparams, batch.src_seq, batch.puncts, batch.style_embed,
             batch.num_phonemes)

    # every process checks ITS addressable shards against a local
    # single-device reference of the full batch
    ref = synthesize(params, cfg, host_batch.src_seq, host_batch.puncts,
                     host_batch.style_embed,
                     num_phonemes=host_batch.num_phonemes)
    ref_wav = np.asarray(ref.wav)
    for shard in out.wav.addressable_shards:
        np.testing.assert_allclose(np.asarray(shard.data),
                                   ref_wav[shard.index],
                                   atol=2e-4, rtol=1e-3)
    # and a cross-process checksum both processes must agree on
    wav_sum = float(jax.jit(lambda w: jnp.sum(jnp.abs(w)))(out.wav))
    print(f"CHECK infer_wav_sum {wav_sum:.6f}", flush=True)

    jax.distributed.shutdown()
    print("CHECK done ok", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
