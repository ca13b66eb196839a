"""Named-intermediate capture (tensor_dbg equivalent) tests."""

import numpy as np
import jax.numpy as jnp

from zerovox_tpu.config import TINY_CONFIG
from zerovox_tpu.models.pipeline import synthesize
from zerovox_tpu.params import init_params
from zerovox_tpu.utils.debug import capture_run, summarize, tap

CFG = TINY_CONFIG


def test_tap_is_noop_without_capture():
    x = jnp.ones((3,))
    assert tap("anything", x) is x


def test_capture_pipeline_taps(rng):
    params = init_params(CFG, seed=0)
    src = jnp.asarray(rng.integers(0, CFG.num_phonemes + 1,
                                   size=(1, CFG.max_n_phonemes)))
    pun = jnp.asarray(rng.integers(0, CFG.num_puncts + 1,
                                   size=(1, CFG.max_n_phonemes)))
    style = jnp.asarray(rng.normal(scale=0.1, size=(1, CFG.d_model)),
                        jnp.float32)

    out, taps = capture_run(
        lambda p, s, pu, se: synthesize(p, CFG, s, pu, se),
        params, src, pun, style)

    # the reference's permanent probes, plus stage outputs
    for name in ("encoder_output", "features", "log_duration", "mel",
                 "dbg", "wav"):
        assert name in taps, f"missing tap {name}; have {sorted(taps)}"
    assert taps["mel"].shape == (1, CFG.max_seq_len, CFG.num_mels)
    np.testing.assert_array_equal(np.asarray(taps["wav"]),
                                  np.asarray(out.wav))

    # captured values must match a plain (uncaptured, eager) run
    plain = synthesize(params, CFG, src, pun, style)
    np.testing.assert_allclose(np.asarray(plain.wav), np.asarray(out.wav),
                               atol=1e-5, rtol=1e-5)

    line = summarize("mel", taps["mel"])
    assert "sum:" in line and "mel" in line


def test_capture_does_not_leak(rng):
    """After capture_run, taps must be no-ops again."""
    x = jnp.ones((2,))
    capture_run(lambda a: tap("t", a * 2), x)
    assert tap("t2", x) is x


def test_dump_hlo(tmp_path):
    """dump_hlo mirrors ggml_graph_print/dump_dot: the traced and the
    compiled program text of any jittable function."""
    from zerovox_tpu.utils.debug import dump_hlo
    import jax.numpy as jnp

    def f(a, b):
        return jnp.tanh(a @ b)

    a = jnp.ones((4, 8)); b = jnp.ones((8, 4))
    txt = dump_hlo(f, a, b)
    assert "tanh" in txt and "dot" in txt
    out = str(tmp_path / "g.hlo")
    opt = dump_hlo(f, a, b, optimized=True, path=out)
    assert "fusion" in opt or "tanh" in opt
    assert open(out).read() == opt


def test_dump_dot(tmp_path):
    """dump_dot renders the jaxpr as Graphviz, like ggml_graph_dump_dot
    (/root/reference/ggml/src/ggml.c:6124): valid digraph, one node per
    primitive, dataflow edges, and it round-trips through a file."""
    from zerovox_tpu.utils.debug import dump_dot
    import jax.numpy as jnp

    def f(a, b):
        return jnp.tanh(a @ b) + a.sum()

    a = jnp.ones((4, 8)); b = jnp.ones((8, 4))
    out = str(tmp_path / "g.dot")
    dot = dump_dot(f, a, b, path=out)
    assert dot.startswith("digraph") and dot.rstrip().endswith("}")
    assert "tanh" in dot and "dot_general" in dot and "->" in dot
    assert "in0" in dot and "out0" in dot
    assert open(out).read() == dot
    # the full production pipeline renders without error and bounded
    from zerovox_tpu.config import TINY_CONFIG
    from zerovox_tpu.models.pipeline import synthesize
    from zerovox_tpu.params import init_params
    cfg = TINY_CONFIG
    params = init_params(cfg, seed=0)
    src = jnp.zeros((1, cfg.max_n_phonemes), jnp.int32)
    sty = jnp.zeros((1, cfg.d_model), jnp.float32)
    big = dump_dot(lambda p, s, st: synthesize(p, cfg, s, s, st).wav,
                   params, src, sty, max_nodes=200)
    assert "truncated" in big or big.count(" -> ") > 50
