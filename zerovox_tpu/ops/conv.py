"""1-D convolution primitives, channels-last (TPU lane dim = channels).

The reference lowers every Conv1d through ggml's im2col + mul_mat
(/root/reference/ggml/src/ggml.c:3769) and hand-rolls ConvTranspose1d as
zero-stuffing views + a flipped-kernel conv (/root/reference/src/hifigan.cpp:22-71).
On TPU both are a single `lax.conv_general_dilated` that XLA tiles onto the MXU;
transposed convolution uses lhs_dilation instead of materialising zeros.

Layout conventions:
  activations: (B, T, C)  — NHC; channels on the 128-lane axis
  kernels:     (K, C_in, C_out) — HIO
A torch Conv1d weight (C_out, C_in, K) maps to ours via .transpose(2, 1, 0).
A torch ConvTranspose1d weight (C_in, C_out, K) maps via flip(K) then
.transpose(2, 0, 1); the reference GGUF already stores that flipped layout
(utils/zv2gguf.py:176-178), see zerovox_tpu.params.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_DIMENSION_NUMBERS = ("NHC", "HIO", "NHC")

# --- ggml f16-staging simulation ------------------------------------------
# The reference stages EVERY conv through f16: weights are stored f16
# (/root/reference/utils/zv2gguf.py:156-161) and ggml's im2col forces the
# patch matrix to f16 regardless of the activation dtype
# (/root/reference/ggml/src/ggml.c:3776), accumulating in f32.  This flag
# reproduces that precision profile so the f32 parity path can be compared
# against actual ggml numerics (tolerance documented in docs/ARCHITECTURE.md
# and BASELINE.md).  Trace-time only: re-jit after toggling.
_F16_STAGING = False


class f16_staging:
    """Context manager: run convs with f16 inputs/weights + f32 accumulate."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled

    def __enter__(self):
        global _F16_STAGING
        self.prev = _F16_STAGING
        _F16_STAGING = self.enabled
        return self

    def __exit__(self, *exc):
        global _F16_STAGING
        _F16_STAGING = self.prev


def _staged(*arrays):
    """Cast matmul operands to f16 when the staging simulation is on.

    Applied at EVERY conv formulation's dot site (native, im2col, polyphase/
    grouped transpose, folded, contracted tail) so the simulation covers the
    whole precision profile ggml has — not just the plain conv1d path.
    `linear` is intentionally excluded: the reference exporter casts only
    conv/FFN weights (utils/zv2gguf.py:156-161); attention/style projections
    stay f32.
    """
    if _F16_STAGING:
        return tuple(a.astype(jnp.float16) for a in arrays)
    return arrays

# XLA's TPU conv lowering wastes the 128-lane MXU tiles when the channel count
# is small: measured on v5e, a C=32 dilated conv runs at ~3 TFLOP/s-effective
# while the equivalent im2col matmul (L, K*C) @ (K*C, C) runs at ~40 TFLOP/s
# (17x).  In *isolation* the crossover is at C=128, but inside the full
# vocoder graph the C=128 im2col cols-concats cost ~3 ms of extra HBM traffic
# (measured: stage-2 cut 8.6 -> 5.4 ms with native convs), so the production
# threshold stays below it.  C <= 64 stages use the folded path anyway.
_IM2COL_MAX_CHANNELS = 64


def conv1d_im2col(x: jnp.ndarray,
                  w: jnp.ndarray,
                  b: Optional[jnp.ndarray] = None,
                  padding: int = 0,
                  dilation: int = 1) -> jnp.ndarray:
    """Stride-1 Conv1d as an explicit im2col matmul (small-channel fast path)."""
    B, T, Cin = x.shape
    K = w.shape[0]
    T_out = T + 2 * padding - dilation * (K - 1)
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    cols = jnp.concatenate(
        [lax.dynamic_slice_in_dim(xp, j * dilation, T_out, axis=1)
         for j in range(K)], axis=-1)
    wm = w.reshape(K * Cin, -1)
    if _F16_STAGING:
        cols = cols.astype(jnp.float16)
        wm = wm.astype(jnp.float16)
    out = jnp.einsum("blc,co->blo", cols, wm,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + b
    return out


def conv1d(x: jnp.ndarray,
           w: jnp.ndarray,
           b: Optional[jnp.ndarray] = None,
           stride: int = 1,
           padding: int = 0,
           dilation: int = 1) -> jnp.ndarray:
    """Conv1d with symmetric padding.  x: (B, T, Cin), w: (K, Cin, Cout).

    Dispatches small-channel stride-1 convs to the im2col matmul formulation
    (see _IM2COL_MAX_CHANNELS); everything else uses the native XLA conv.
    """
    K, Cin, Cout = w.shape
    if (stride == 1 and K > 1
            and max(Cin, Cout) <= _IM2COL_MAX_CHANNELS):
        return conv1d_im2col(x, w, b, padding=padding, dilation=dilation)
    xc, wc = x, w
    if _F16_STAGING:
        xc = x.astype(jnp.float16)
        wc = w.astype(jnp.float16)
    if K == 1 and stride == 1 and padding == 0:
        # a 1x1 conv IS a matmul; go straight to the MXU
        out = lax.dot_general(xc, wc[0],
                              dimension_numbers=(((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        out = out.astype(x.dtype)
        if b is not None:
            out = out + b
        return out
    if stride == 1 and x.shape[0] == 1:
        # B = 1: sum of K shifted dense dots.  XLA's conv emitter
        # (EmitAllBatchInSublanes) has no batch to pack into sublanes and
        # runs far off roofline (traced: 0.71 ms/run of decoder + input
        # convs at production geometry); K row-sliced dot_generals go
        # straight to the MXU.  With a real batch the emitter wins.
        T = x.shape[1]
        T_out = T + 2 * padding - dilation * (K - 1)
        xp = jnp.pad(xc, ((0, 0), (padding, padding), (0, 0)))
        acc = None
        for j in range(K):
            sl = lax.slice_in_dim(xp, j * dilation, j * dilation + T_out,
                                  axis=1)
            y = lax.dot_general(sl, wc[j],
                                dimension_numbers=(((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        out = acc.astype(x.dtype)
        if b is not None:
            out = out + b
        return out
    out = lax.conv_general_dilated(
        xc, wc,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMENSION_NUMBERS,
        preferred_element_type=(jnp.float32 if (x.dtype == jnp.float32
                                                or _F16_STAGING) else None),
    )
    out = out.astype(x.dtype)
    if b is not None:
        out = out + b
    return out


def _check_output_padding(stride: int, output_padding: int):
    """torch's ConvTranspose1d domain rule (output_padding < stride).

    Outside it the op has no defined semantics and every formulation here
    diverges — the lhs_dilation form even reads out of bounds via negative
    conv padding, and such geometries are the only way
    build_wtranspose_grouped's d_lo can go positive (review r3 #2) —
    so reject instead of answering garbage, exactly as torch does."""
    if output_padding >= max(1, stride):
        raise ValueError(
            f"output_padding ({output_padding}) must be < stride ({stride})")


def transpose_out_len(L: int, stride: int, K: int, padding: int,
                      output_padding: int) -> int:
    """ConvTranspose1d output length (torch semantics).  Equals L*stride
    exactly when K == stride + 2*padding - output_padding (the standard
    upsampling geometry with pad = s//2 + s%2, outpad = s%2 <=> K == 2s)."""
    return (L - 1) * stride + K - 2 * padding + output_padding


def conv_transpose1d_lax(x: jnp.ndarray,
                         w_flipped: jnp.ndarray,
                         b: Optional[jnp.ndarray] = None,
                         stride: int = 1,
                         padding: int = 0,
                         output_padding: int = 0) -> jnp.ndarray:
    """ConvTranspose1d via XLA lhs_dilation (reference formulation).

    Kept for parity testing; the production path is the polyphase form below
    — profiling showed XLA's dilated-input conv costing 6.5 ms for the 64->32
    upsample inside the full vocoder graph vs <0.4 ms isolated.
    """
    k = w_flipped.shape[0]
    _check_output_padding(stride, output_padding)
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    xc, wc = _staged(x, w_flipped)
    out = lax.conv_general_dilated(
        xc, wc,
        window_strides=(1,),
        padding=[(lo, hi)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMENSION_NUMBERS,
        preferred_element_type=(jnp.float32 if (x.dtype == jnp.float32
                                                or _F16_STAGING) else None),
    )
    out = out.astype(x.dtype)
    if b is not None:
        out = out + b
    return out


def conv_transpose1d(x: jnp.ndarray,
                     w_flipped: jnp.ndarray,
                     b: Optional[jnp.ndarray] = None,
                     stride: int = 1,
                     padding: int = 0,
                     output_padding: int = 0) -> jnp.ndarray:
    """ConvTranspose1d, polyphase formulation.

    `w_flipped` is (K, Cin, Cout) in *flipped correlation* layout: correlating
    the stride-dilated input with it reproduces torch's ConvTranspose1d —
    exactly the scheme the reference exporter bakes in (utils/zv2gguf.py:176-178)
    and its runtime re-derives with zero-stuffing views
    (/root/reference/src/hifigan.cpp:44-65).

    Instead of XLA's lhs_dilation (implicitly zero-stuffed input — measured
    pathologically slow in composition), each output phase r in [0, stride)
    is an ordinary stride-1 conv with the kernel's r-th polyphase component,
    and the phases interleave via a free row-major reshape.

    Output length: (T-1)*stride + K - 2*padding + output_padding; this
    implementation requires that to equal T*stride (true for the standard
    pad = s//2 + s%2, outpad = s%2 upsampling geometry) and falls back to the
    lax formulation otherwise.
    """
    B, L, Cin = x.shape
    K, _, Cout = w_flipped.shape
    _check_output_padding(stride, output_padding)
    out_len = transpose_out_len(L, stride, K, padding, output_padding)
    # at short lengths (streaming chunks, small buckets) the polyphase
    # slicing/stack overhead dominates — the lax path wins there
    if stride == 1 or out_len != L * stride or L < 8192:
        return conv_transpose1d_lax(x, w_flipped, b, stride, padding,
                                    output_padding)

    lo = K - 1 - padding
    # phase r: y[s*q + r] = sum_u w_flipped[m_r + s*u] . x[q + o_r + u]
    phase = []
    for r in range(stride):
        m_r = (lo - r) % stride
        w_r = w_flipped[m_r::stride]
        o_r = (r + m_r - lo) // stride
        phase.append((w_r, o_r, w_r.shape[0]))
    pl = max(0, -min(o for (_, o, _) in phase))
    # each phase's valid conv must cover slice [pl+o_r, pl+o_r+L): the last
    # read touches xp[pl + L-1 + o_r + K_r-1]
    pr = max(0, max(o + kr - 1 for (_, o, kr) in phase))
    xp = jnp.pad(x, ((0, 0), (pl, pr), (0, 0)))

    outs = []
    for (w_r, o_r, k_r) in phase:
        # conv1d dispatches small-channel phases to the im2col fast path
        y = conv1d(xp, w_r, None, padding=0)
        outs.append(lax.dynamic_slice_in_dim(y, pl + o_r, L, axis=1))

    out = jnp.stack(outs, axis=2).reshape(B, L * stride, Cout)
    if b is not None:
        out = out + b
    return out


def build_wtranspose_grouped(w_flipped: jnp.ndarray, stride: int,
                             padding: int, g: int, rho_in: int):
    """Row-grouped weights for ConvTranspose1d as ONE strided conv.

    The polyphase form (conv_transpose1d) computes each output phase
    separately and interleaves with dynamic slices + stack + reshape —
    measured ~1.5 ms of pure data movement per pipeline run at production
    geometry.  Instead, group g source steps per OUTPUT ROW: row Q carries
    the g*stride output timesteps [Q*g*stride, (Q+1)*g*stride) as lanes
    (tau, cout), computed by an ordinary row-stride-a conv (a = g/rho_in)
    against rho_in-folded input rows — no interleave anywhere; the lane
    order IS the time order, so downstream regrouping to rho-folded rows is
    a free row-major reshape.

    Returns (delta_lo, M) with M of shape (n_delta, rho_in*Cin,
    g*stride*Cout): y_rows[Q] = sum_d x_rows[a*Q + delta_lo + d] @ M[d].
    Built as a constant one-hot einsum (see build_wcontract for why not a
    gather).
    """
    import numpy as np
    K, Cin, Cout = w_flipped.shape
    s = stride
    lo = K - 1 - padding
    # phase tables (same derivation as conv_transpose1d)
    phases = []
    for r in range(s):
        m_r = (lo - r) % s
        o_r = (r + m_r - lo) // s
        k_r = len(range(m_r, K, s))
        phases.append((m_r, o_r, k_r))
    rel = [tau // s + phases[tau % s][1] + u
           for tau in range(g * s) for u in range(phases[tau % s][2])]
    d_lo = min(rel) // rho_in
    d_hi = max(rel) // rho_in
    n_d = d_hi - d_lo + 1
    onehot = np.zeros((n_d, rho_in, g * s, K), np.float32)
    for tau in range(g * s):
        m_r, o_r, k_r = phases[tau % s]
        for u in range(k_r):
            p = tau // s + o_r + u
            onehot[p // rho_in - d_lo, p % rho_in, tau, m_r + s * u] = 1.0
    O = jnp.asarray(onehot, w_flipped.dtype)
    # M[d, (sigma,cin), (tau,cout)] = w_flipped[k0, cin, cout]
    M = jnp.einsum("dptk,kco->dpcto", O, w_flipped,
                   preferred_element_type=w_flipped.dtype)
    return d_lo, M.reshape(n_d, rho_in * Cin, g * s * Cout)


def conv_transpose1d_grouped(x_rows: jnp.ndarray,
                             w_flipped: jnp.ndarray,
                             b: Optional[jnp.ndarray] = None,
                             stride: int = 1,
                             padding: int = 0,
                             output_padding: int = 0,
                             rho_in: int = 1,
                             g: int = 1) -> jnp.ndarray:
    """ConvTranspose1d from rho_in-folded rows to g-grouped output rows.

    x_rows: (B, R, rho_in*Cin) — R*rho_in source timesteps.
    Returns (B, R*rho_in/g, g*stride*Cout): same samples as
    conv_transpose1d(unfold(x_rows)), rows of g*stride timesteps in time
    order (row-major reshape recovers (B, L*stride, Cout) exactly).
    Requires the standard upsampling geometry (out_len == L*stride),
    g % rho_in == 0, and (R*rho_in) % g == 0.
    """
    B, R, rc = x_rows.shape
    K, Cin, Cout = w_flipped.shape
    assert rc == rho_in * Cin
    _check_output_padding(stride, output_padding)
    L = R * rho_in
    out_len = transpose_out_len(L, stride, K, padding, output_padding)
    assert out_len == L * stride, "grouped transpose requires same-multiple geometry"
    assert g % rho_in == 0 and L % g == 0
    a = g // rho_in
    R_out = L // g

    d_lo, M = build_wtranspose_grouped(w_flipped, stride, padding, g, rho_in)
    n_d = M.shape[0]
    # d_lo may be positive for exotic (large-pad) geometries; clamp the left
    # pad and carry the residual shift into the slice origins instead of
    # handing jnp.pad a negative width (ADVICE r2)
    pad_l = max(0, -d_lo)
    base = d_lo + pad_l                 # xp row of delta d's Q=0 read is base+d
    pad_r = max(0, (R_out - 1) * a + d_lo + n_d - 1 - (R - 1))
    # B = 1: explicit sum of sliced matmuls instead of conv_general_dilated.
    # XLA's strided-conv emitter (EmitAllBatchInSublanes) ran these 6-10x
    # off roofline at B=1 (traced fusion.81/85/101 = 1.08 ms/run at
    # production geometry; dots cut the pipeline 6.26 -> 5.27 ms), but with
    # a real batch to pack into sublanes the emitter wins (B=8 pipeline:
    # conv 42.0 ms vs dots 48.6 ms) — so dispatch on the static batch size.
    # For row stride a > 1 the strided slice is expressed as a FREE
    # row-major a-grouped reshape + contiguous row/lane slices (a strided
    # sublane slice would materialise a copy): rows of x[d::a] are
    # xg[d//a :, (d%a)*rc : (d%a+1)*rc] of xg = x.reshape(-1, a*rc).
    if B > 1:
        xc, Mc = _staged(x_rows, M)
        # exact conv padding: y[Q] = sum_d x[a*Q + d_lo + d] @ M[d] needs
        # low = -d_lo (negative = XLA crops, which is correct for d_lo > 0
        # — the r2 pad_l clamp must NOT reach this path) and a high pad
        # sized so the output count is exactly R_out
        hi = (R_out - 1) * a + n_d - R + d_lo
        out = lax.conv_general_dilated(
            xc, Mc,
            window_strides=(a,),
            padding=[(-d_lo, hi)],
            dimension_numbers=_DIMENSION_NUMBERS,
            preferred_element_type=jnp.float32
            if (x_rows.dtype == jnp.float32 or _F16_STAGING) else None,
        ).astype(x_rows.dtype)
        if b is not None:
            out = out + jnp.tile(b, g * stride)
        return out
    xp = jnp.pad(x_rows, ((0, 0), (pad_l, pad_r), (0, 0)))
    acc = None
    if a == 1:
        for d in range(n_d):
            sl, Md = _staged(
                lax.slice_in_dim(xp, base + d, base + d + R_out, axis=1),
                M[d])
            y = lax.dot_general(sl, Md,
                                dimension_numbers=(((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    else:
        rows_needed = ((base + n_d - 1) // a + R_out) * a
        extra = rows_needed - xp.shape[1]
        if extra > 0:
            xp = jnp.pad(xp, ((0, 0), (0, extra), (0, 0)))
        xg = xp.reshape(B, xp.shape[1] // a, a * rc)
        for d in range(n_d):
            q, p = divmod(base + d, a)
            sl, Md = _staged(lax.slice(xg, (0, q, p * rc),
                                       (B, q + R_out, (p + 1) * rc)), M[d])
            y = lax.dot_general(sl, Md,
                                dimension_numbers=(((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    out = acc.astype(x_rows.dtype)
    if b is not None:
        out = out + jnp.tile(b, g * stride)
    return out


def fold(x: jnp.ndarray, rho: int) -> jnp.ndarray:
    """(B, L, C) -> (B, L/rho, rho*C): pack rho time steps into the lane dim.

    TPU arrays put the last axis on the 128 hardware lanes; a C=32 activation
    physically pads 32 -> 128 lanes, inflating every HBM pass 4x.  Folding
    keeps small-channel stages lane-dense (rho*C = 128).  Measured on v5e:
    a full HiFi-GAN stage-4 MRF (3 resblocks, C=32, L=450k) runs 3.2x faster
    folded (4.8 ms vs 15.5 ms), bit-identically.
    """
    B, L, C = x.shape
    return x.reshape(B, L // rho, rho * C)


def unfold(xf: jnp.ndarray, rho: int) -> jnp.ndarray:
    """Inverse of fold."""
    B, nblk, rc = xf.shape
    return xf.reshape(B, nblk * rho, rc // rho)


def _folded_weight_terms(k: int, rho: int, padding: int, dilation: int,
                         dphase: int = 0):
    """Static map delta -> [(slot_in, slot_out, tap)] for the folded conv.

    Output block b, slot i takes tap j from absolute position
    b*rho + i + j*dilation - padding = (b+delta)*rho + r.

    dphase = phase_in - phase_out generalizes to PHASE-SHIFTED folded
    layouts (slot i of block b holding timestep b*rho + i - phase): the
    phase difference shifts every position by a constant, which can shrink
    the delta set — e.g. rho=4, k=3, d=1 drops from 3 offsets to 2 at
    |dphase| = 1.  The fused MRF kernel exploits this per conv pair
    (ops/pallas/folded_mrf.py): the intermediate between convs1 and convs2
    lives at a shifted phase, entirely absorbed into the weight scatter —
    zero runtime relayout, ~25% fewer MXU passes per folded stage.
    """
    terms = {}
    for j in range(k):
        for i in range(rho):
            pos = i + j * dilation - padding + dphase
            delta, r = pos // rho, pos % rho
            terms.setdefault(delta, []).append((r, i, j))
    return sorted(terms.items())


def build_wdelta(w: jnp.ndarray, rho_in: int, rho_out: int,
                 padding: int, dilation: int, dphase: int = 0):
    """Stacked folded weight matrices for a stride-1 conv.

    Returns (deltas, W) with W of shape
    (n_delta, rho_in*Cin, rho_out*Cout): W[d][r*Cin:(r+1)Cin,
    i*Cout:(i+1)Cout] = w[j] when output slot i takes tap j from input slot r
    of block offset deltas[d].  Built with ONE gather from a static index
    table (a per-tap scatter chain explodes XLA compile time at rho_out=128).
    dphase = phase_in - phase_out, see _folded_weight_terms.
    """
    import numpy as np
    k, Cin, Cout = w.shape
    terms = {}
    for j in range(k):
        for i_out in range(rho_out):
            pos = i_out + j * dilation - padding + dphase
            delta, r = pos // rho_in, pos % rho_in
            terms.setdefault(delta, []).append((r, i_out, j))
    deltas = sorted(terms)
    # idx[d, r, i_out] = tap j (or k = zero tap)
    idx = np.full((len(deltas), rho_in, rho_out), k, dtype=np.int32)
    for d, delta in enumerate(deltas):
        for (r, i_out, j) in terms[delta]:
            idx[d, r, i_out] = j
    w_ext = jnp.concatenate([w, jnp.zeros((1, Cin, Cout), w.dtype)], axis=0)
    # (n_delta, rho_in, rho_out, Cin, Cout) -> (n_delta, rho_in*Cin, rho_out*Cout)
    gathered = w_ext[jnp.asarray(idx)]
    W = gathered.transpose(0, 1, 3, 2, 4).reshape(
        len(deltas), rho_in * Cin, rho_out * Cout)
    return deltas, W


def conv1d_folded(xf: jnp.ndarray,
                  w: jnp.ndarray,
                  b: Optional[jnp.ndarray] = None,
                  padding: int = 0,
                  dilation: int = 1,
                  rho: int = 4) -> jnp.ndarray:
    """Stride-1 same-length Conv1d on a folded (B, L/rho, rho*C) activation.

    The conv becomes a sum of block-shifted dense (rho*C, rho*C) matmuls: for
    each block offset delta, a weight matrix W_delta scatters the taps that
    land delta blocks away.  All matmuls are lane-dense 128-wide MXU work.
    Requires Cin == Cout == C and 2*padding == dilation*(k-1) (same-length).
    """
    k, Cin, Cout = w.shape
    assert Cin == Cout, "folded conv requires Cin == Cout"
    C = Cin
    B, nblk, rc = xf.shape
    assert rc == rho * C

    deltas, W = build_wdelta(w, rho, rho, padding, dilation)
    lo, hi = -deltas[0], deltas[-1]
    xpad = jnp.pad(xf, ((0, 0), (lo, hi), (0, 0)))

    # one lane-dense matmul over the concatenation of shifted views
    cols = jnp.concatenate(
        [lax.dynamic_slice_in_dim(xpad, d + lo, nblk, axis=1)
         for d in deltas], axis=-1)
    wcat = W.reshape(len(deltas) * rho * C, rho * C)
    cols, wcat = _staged(cols, wcat)
    out = jnp.einsum("blc,co->blo", cols, wcat,
                     preferred_element_type=jnp.float32).astype(xf.dtype)
    if b is not None:
        out = out + jnp.tile(b, rho)
    return out


def contracted_layout(k: int, rho: int, dilation: int, C: int):
    """Exactly-touched operand layout of one folded same-length conv.

    A folded conv's output block row (rho timesteps of C channels) reads, per
    kernel tap tau = (i - (k-1)/2)*dilation, the run of rho input timesteps
    [tau, tau + rho).  Overlapping/adjacent runs merge; the union is usually
    much smaller than the n_delta full block rows the W_delta formulation
    multiplies against (k*rho touched timesteps vs n_delta*rho), e.g. stage-4
    geometry (rho=4, d=1): 6 timesteps = 192 lanes vs 3 deltas = 384.

    Returns (segments, pieces, total):
      segments: merged [a, b) timestep ranges relative to the output block
      pieces:   [(q, lo, hi)] — row-aligned lane windows: row offset q of the
                folded array, lane range [lo, hi) within that row; operand =
                lane-concat of the pieces
      total:    operand width in lanes
    """
    half = (k - 1) // 2
    taps = sorted((i - half) * dilation for i in range(k))
    segments = []
    for t in taps:
        a, b = t, t + rho
        if segments and a <= segments[-1][1]:
            segments[-1][1] = max(segments[-1][1], b)
        else:
            segments.append([a, b])
    lanes = rho * C
    pieces = []
    for a, b in segments:
        glo, ghi = a * C, b * C
        while glo < ghi:
            q = glo // lanes
            qe = (q + 1) * lanes
            pieces.append((q, glo - q * lanes, min(ghi, qe) - q * lanes))
            glo = min(ghi, qe)
    total = sum(hi - lo for _, lo, hi in pieces)
    return [tuple(s) for s in segments], pieces, total


def build_wcontract(w: jnp.ndarray, rho: int, dilation: int):
    """Contracted-operand weight of a folded same-length conv.

    Returns (pieces, W) with W of shape (total, rho*Cout): concatenating the
    `pieces` lane windows of the folded input (per output block row) and
    multiplying by W reproduces conv1d_folded's W_delta sum exactly, with
    ceil(total/128) MXU passes instead of n_delta.  Cin may differ from Cout
    (operand lanes are Cin-indexed, output columns rho*Cout — used by the
    folded-output tail conv); same-length MRF use keeps Cin == Cout.
    """
    import numpy as np
    k, Cin, Cout = w.shape
    C = Cin
    half = (k - 1) // 2
    segments, pieces, total = contracted_layout(k, rho, dilation, C)
    # Scatter via a CONSTANT one-hot + einsum, not advanced-indexing gathers:
    # a (tap_idx, cin_of) double gather lowered to a 4.96 ms device gather at
    # production tail geometry; the one-hot contraction is a trivial matmul.
    cs = [c for a, b in segments for c in range(a, b)]
    onehot = np.zeros((len(cs), rho, k), np.float32)
    for p, c in enumerate(cs):
        for i in range(k):
            j = c - (i - half) * dilation
            if 0 <= j < rho:
                onehot[p, j, i] = 1.0
    O = jnp.asarray(onehot, w.dtype)              # (n_c, rho, k)
    # W[(c,cin), (j,cout)] = w[i, cin, cout] iff c == j + tau_i
    W = jnp.einsum("pjt,tcd->pcjd", O, w,
                   preferred_element_type=w.dtype)
    assert len(cs) * Cin == total
    return pieces, W.reshape(total, rho * Cout)


def conv1d_folded_out(xf: jnp.ndarray,
                      w: jnp.ndarray,
                      b: Optional[jnp.ndarray] = None,
                      padding: int = 0,
                      dilation: int = 1,
                      rho_in: int = 1,
                      rho_out: int = 128) -> jnp.ndarray:
    """Stride-1 conv from a rho_in-folded input to a rho_out-folded output.

    Built for tiny-C_out heads: a (L, 1) result is a 1-lane array whose every
    HBM pass is 128x padded; producing (L/rho_out, rho_out*C_out) instead
    keeps the write lane-dense.  Requires rho_in | rho_out and
    L % rho_out == 0.  The conv becomes, per output block b, a sum over block
    offsets delta of x_f[b*(rho_out/rho_in) + delta] @ W_delta with
    statically scattered (rho_in*Cin, rho_out*Cout) weights.
    """
    k, Cin, Cout = w.shape
    B, nblk_in, rc = xf.shape
    assert rc == rho_in * Cin and rho_out % rho_in == 0
    stride = rho_out // rho_in
    nblk_out = nblk_in // stride

    deltas, W = build_wdelta(w, rho_in, rho_out, padding, dilation)
    lo, hi = -deltas[0], deltas[-1]
    xpad = jnp.pad(xf, ((0, 0), (lo, hi), (0, 0)))

    out = None
    for di, delta in enumerate(deltas):
        start = delta + lo
        xv = xpad[:, start:start + nblk_out * stride:stride]
        xv, wd = _staged(xv, W[di])
        y = jnp.einsum("blc,co->blo", xv, wd,
                       preferred_element_type=jnp.float32)
        out = y if out is None else out + y
    out = out.astype(xf.dtype)
    if b is not None:
        out = out + jnp.tile(b, rho_out)
    return out


def conv1d_folded_out_contract(xf: jnp.ndarray,
                               w: jnp.ndarray,
                               b: Optional[jnp.ndarray] = None,
                               padding: int = 0,
                               rho_in: int = 1,
                               rho_out: int = 128) -> jnp.ndarray:
    """Folded-output tail conv, batch-dispatched to its measured-best form.

    B > 1 — ONE strided native conv (§11 ninth finding): the contracted
    layout of the rho_out-folded output is literally a 1-D conv over the
    rho_in-folded rows with kernel span (rmax-rmin+1) rows and stride
    rho_out/rho_in; the batched conv emitter consumes the (B, L, rc)
    activation with NO widening relayout and handles the halo rows inside
    the window.  Measured at the B=8 production tail: 0.27 ms vs 2.01 for
    the widening reshape + 4k-wide dot (the reshape alone was 0.76 ms of
    pure relayout — the largest non-kernel op left after r4).  A 4-D
    split-axis einsum ("bnsc,sco->bno") was tried between the two: XLA
    re-materialises the "free" row-split as the same relayout, so it
    saves nothing in composition.

    B == 1 — the widened formulation (reshape + per-piece lane-window
    dots): the conv emitter packs batch into sublanes and has nothing to
    pack at B=1, measured 3x slower there (0.28 vs 0.095 ms) — the same
    dispatch rule as every other conv site (§3e).

    Requires stride-1 same-length (2*padding == k-1), rho_in | rho_out,
    and nblk_in % (rho_out/rho_in) == 0.
    """
    k, Cin, Cout = w.shape
    B, nblk_in, rc = xf.shape
    assert rc == rho_in * Cin and rho_out % rho_in == 0
    assert 2 * padding == k - 1, "contracted tail requires same-length conv"
    stride = rho_out // rho_in
    assert nblk_in % stride == 0
    if B == 1:
        return _folded_out_contract_widened(xf, w, b, padding,
                                            rho_in, rho_out)
    pieces, W = build_wcontract(w, rho_out, 1)
    # kernel row span in input-row units: piece (q, lo, hi) covers input
    # rows q*stride + lo//rc .. q*stride + (hi-1)//rc
    offs = [q * stride + s
            for q, lo, hi in pieces
            for s in range(lo // rc, (hi - 1) // rc + 1)]
    rmin, rmax = min(offs), max(offs)
    K = jnp.zeros((rmax - rmin + 1, rc, rho_out * Cout), W.dtype)
    row = 0
    for q, lo, hi in pieces:
        g = lo
        while g < hi:
            s, l0 = divmod(g, rc)
            l1 = min(rc, l0 + (hi - g))
            K = K.at[q * stride + s - rmin, l0:l1, :].set(
                W[row: row + l1 - l0])
            row += l1 - l0
            g += l1 - l0
    x_, K_ = _staged(xf, K)
    out = jax.lax.conv_general_dilated(
        x_, K_, window_strides=(stride,),
        padding=((-rmin, rmax - (stride - 1)),),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32).astype(xf.dtype)
    if b is not None:
        out = out + jnp.tile(b, rho_out)
    return out


def _folded_out_contract_widened(xf, w, b, padding, rho_in, rho_out):
    """The widened formulation (physical widening reshape + per-piece
    lane-window dots) — the B=1 path, where the conv emitter loses."""
    k, Cin, Cout = w.shape
    B, nblk_in, rc = xf.shape
    stride = rho_out // rho_in
    nblk_out = nblk_in // stride
    x = xf.reshape(B, nblk_out, rho_out * Cin)
    pieces, W = build_wcontract(w, rho_out, 1)
    qmin = min(q for q, _, _ in pieces)
    qmax = max(q for q, _, _ in pieces)
    xp = jnp.pad(x, ((0, 0), (-qmin, qmax), (0, 0)))
    out = None
    row = 0
    for q, lo, hi in pieces:
        sl, Wp = _staged(xp[:, -qmin + q: -qmin + q + nblk_out, lo:hi],
                         W[row: row + hi - lo])
        y = jnp.einsum("blc,co->blo", sl, Wp,
                       preferred_element_type=jnp.float32)
        out = y if out is None else out + y
        row += hi - lo
    out = out.astype(xf.dtype)
    if b is not None:
        out = out + jnp.tile(b, rho_out)
    return out


def linear(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dense layer.  x: (..., Cin), w: (Cin, Cout)."""
    out = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        out = out + b
    return out
