"""Op-level parity vs torch semantics (the reference's ground truth)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from zerovox_tpu.ops import (bucketize, conv1d, conv_transpose1d,
                             durations_from_log, instance_norm, layer_norm,
                             leaky_relu, length_regulate, linear,
                             multi_head_attention)


@pytest.mark.parametrize("stride,padding,dilation", [
    (1, 0, 1), (1, 1, 1), (1, 4, 1), (2, 1, 1), (1, 2, 2), (1, 5, 5),
])
def test_conv1d_vs_torch(rng, stride, padding, dilation):
    B, T, Cin, Cout, K = 2, 20, 6, 10, 3
    x = rng.normal(size=(B, T, Cin)).astype(np.float32)
    w = rng.normal(size=(K, Cin, Cout)).astype(np.float32)
    b = rng.normal(size=(Cout,)).astype(np.float32)

    got = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                 stride=stride, padding=padding, dilation=dilation)

    tx = torch.from_numpy(x).permute(0, 2, 1)            # (B, Cin, T)
    tw = torch.from_numpy(np.ascontiguousarray(w.transpose(2, 1, 0)))
    ref = F.conv1d(tx, tw, torch.from_numpy(b), stride=stride,
                   padding=padding, dilation=dilation).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("stride,K", [(5, 10), (4, 8), (3, 6), (2, 4)])
def test_conv_transpose1d_vs_torch(rng, stride, K):
    """The HiFi-GAN upsample geometry: pad = s//2 + s%2, outpad = s%2."""
    B, T, Cin, Cout = 2, 12, 6, 4
    padding = stride // 2 + stride % 2
    output_padding = stride % 2
    x = rng.normal(size=(B, T, Cin)).astype(np.float32)
    wt = rng.normal(size=(Cin, Cout, K)).astype(np.float32)  # torch layout
    b = rng.normal(size=(Cout,)).astype(np.float32)

    # flipped correlation layout (what the reference GGUF stores)
    w_flipped = np.ascontiguousarray(wt[:, :, ::-1].transpose(2, 0, 1))
    got = conv_transpose1d(jnp.asarray(x), jnp.asarray(w_flipped), jnp.asarray(b),
                           stride=stride, padding=padding,
                           output_padding=output_padding)

    ref = F.conv_transpose1d(torch.from_numpy(x).permute(0, 2, 1),
                             torch.from_numpy(wt), torch.from_numpy(b),
                             stride=stride, padding=padding,
                             output_padding=output_padding).permute(0, 2, 1)
    assert got.shape == tuple(ref.shape)
    assert got.shape[1] == T * stride
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5, rtol=1e-5)


def test_layer_norm_vs_torch(rng):
    B, T, C = 2, 7, 12
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    g = rng.normal(size=(C,)).astype(np.float32)
    b = rng.normal(size=(C,)).astype(np.float32)
    got = layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b))
    ref = F.layer_norm(torch.from_numpy(x), (C,), torch.from_numpy(g),
                       torch.from_numpy(b), eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5, rtol=1e-5)


def test_instance_norm_vs_torch(rng):
    """Instance norm reduces the *time* axis — the reference's #1 parity trap
    (SURVEY §7; utils/instnorm1d.py oracle)."""
    B, T, C = 3, 11, 5
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    g = rng.normal(size=(C,)).astype(np.float32)
    b = rng.normal(size=(C,)).astype(np.float32)
    got = instance_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b))
    inorm = torch.nn.InstanceNorm1d(C, affine=True)
    with torch.no_grad():
        inorm.weight.copy_(torch.from_numpy(g))
        inorm.bias.copy_(torch.from_numpy(b))
    ref = inorm(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(got), ref.detach().numpy(),
                               atol=1e-5, rtol=1e-5)


def test_one_pass_norm_large_mean_parity(rng):
    """ADVICE r3: the bf16 serving path's one-pass variance E[x^2]-E[x]^2
    loses precision as mean^2/var grows; jnp.maximum(var, 0) would hide a
    regression as silently-wrong audio.  Pin the one-pass form against the
    two-pass (f32 parity) form on x ~ N(100, 1) — a 1e4 cancellation ratio,
    far beyond anything a sane checkpoint produces."""
    B, T, C = 2, 64, 8
    x32 = (rng.normal(size=(B, T, C)) + 100.0).astype(np.float32)
    xb = jnp.asarray(x32).astype(jnp.bfloat16)
    # one-pass (bf16 input path) vs two-pass on the SAME bf16-rounded data
    got = instance_norm(xb).astype(jnp.float32)
    ref = instance_norm(jnp.asarray(xb, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=0.05, rtol=0.02)
    # and the normalized output must actually be ~N(0,1), not collapsed
    assert abs(float(np.asarray(got).std()) - 1.0) < 0.1


def test_bucketize_matches_reference_custom_op():
    """Mirror of ggml_zv_mul_clamp_to_i32 (/root/reference/src/fs2encoder.cpp:442-474)."""
    n_bins = 16
    x = np.array([-1.0, -0.01, 0.0, 0.031, 0.033, 0.5, 0.99, 1.0, 2.0],
                 dtype=np.float32)
    got = np.asarray(bucketize(jnp.asarray(x), n_bins))

    bin_max = n_bins - 1
    expected = []
    for v in x:
        y = int(v * bin_max + 0.5)   # C truncation toward zero
        expected.append(min(max(y, 0), bin_max))
    np.testing.assert_array_equal(got, np.array(expected, dtype=np.int32))


def _reference_length_regulator(features, log_dur, num_phonemes, max_seq_len):
    """Literal numpy port of the C host loop (/root/reference/src/fs2encoder.cpp:611-655)."""
    P, C = features.shape
    x = np.zeros((max_seq_len, C), dtype=np.float32)
    xoff = 0
    for i in range(num_phonemes):
        dur = np.exp(log_dur[i]) - 1.0
        d = int(dur + 0.5)
        if d < 0:
            continue
        for _ in range(d):
            x[xoff] = features[i]
            xoff += 1
            if xoff >= max_seq_len:
                break
        if xoff >= max_seq_len:
            break
    return x, xoff


@pytest.mark.parametrize("seed,max_seq_len", [(0, 40), (1, 40), (2, 13), (3, 200)])
def test_length_regulator_matches_reference_loop(seed, max_seq_len):
    rng = np.random.default_rng(seed)
    P, C = 12, 5
    features = rng.normal(size=(P, C)).astype(np.float32)
    log_dur = rng.normal(loc=1.0, scale=1.0, size=(P,)).astype(np.float32)
    num_phonemes = 9

    ref, ref_len = _reference_length_regulator(features, log_dur,
                                               num_phonemes, max_seq_len)

    d = durations_from_log(jnp.asarray(log_dur), max_seq_len)
    got, got_len = length_regulate(jnp.asarray(features)[None], d[None],
                                   max_seq_len, num_phonemes=num_phonemes)
    assert int(got_len[0]) == ref_len
    np.testing.assert_allclose(np.asarray(got[0]), ref, atol=1e-6)


def test_length_regulator_overflow_saturates():
    """exp overflow must saturate (not wrap) before the int cast."""
    d = durations_from_log(jnp.asarray([100.0, -100.0, 0.0]), 64)
    np.testing.assert_array_equal(np.asarray(d), [64, 0, 0])


def test_mha_vs_torch(rng):
    import math
    B, T, C, H = 2, 9, 16, 4
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    p = {}
    tw = {}
    for k in ("wq", "wk", "wv", "wo"):
        w = rng.normal(size=(C, C)).astype(np.float32) * 0.3
        b = rng.normal(size=(C,)).astype(np.float32) * 0.1
        p[k] = jnp.asarray(w)
        p["b" + k[1]] = jnp.asarray(b)
        tw[k] = (torch.from_numpy(w), torch.from_numpy(b))
    g = rng.normal(size=(C,)).astype(np.float32)
    be = rng.normal(size=(C,)).astype(np.float32)
    p["ln_g"], p["ln_b"] = jnp.asarray(g), jnp.asarray(be)

    got = multi_head_attention(jnp.asarray(x), p, n_head=H)

    xt = torch.from_numpy(x)
    d_k = C // H
    q = (xt @ tw["wq"][0] + tw["wq"][1]).view(B, T, H, d_k).permute(0, 2, 1, 3)
    k_ = (xt @ tw["wk"][0] + tw["wk"][1]).view(B, T, H, d_k).permute(0, 2, 1, 3)
    v = (xt @ tw["wv"][0] + tw["wv"][1]).view(B, T, H, d_k).permute(0, 2, 1, 3)
    attn = torch.softmax(q @ k_.transpose(-1, -2) / math.sqrt(d_k), dim=-1)
    o = (attn @ v).permute(0, 2, 1, 3).reshape(B, T, C)
    o = o @ tw["wo"][0] + tw["wo"][1]
    ref = F.layer_norm(o + xt, (C,), torch.from_numpy(g), torch.from_numpy(be))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5, rtol=1e-4)


def test_leaky_relu():
    x = jnp.asarray([-2.0, -0.5, 0.0, 1.0])
    np.testing.assert_allclose(np.asarray(leaky_relu(x, 0.2)),
                               [-0.4, -0.1, 0.0, 1.0], atol=1e-7)


@pytest.mark.parametrize("C,rho,dilation", [(8, 4, 1), (8, 4, 5), (4, 8, 3), (16, 2, 5)])
def test_conv1d_folded_matches_conv1d(rng, C, rho, dilation):
    """Lane-dense folded conv (ops.conv.conv1d_folded) is exact vs conv1d."""
    from zerovox_tpu.ops.conv import conv1d_folded, fold, unfold
    B, L, K = 2, 48, 3
    pad = (K - 1) // 2 * dilation
    x = rng.normal(size=(B, L, C)).astype(np.float32)
    w = rng.normal(size=(K, C, C)).astype(np.float32)
    b = rng.normal(size=(C,)).astype(np.float32)

    ref = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                 padding=pad, dilation=dilation)
    got = unfold(conv1d_folded(fold(jnp.asarray(x), rho), jnp.asarray(w),
                               jnp.asarray(b), padding=pad, dilation=dilation,
                               rho=rho), rho)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("B", [1, 2])   # B=1 widened dots, B>1 strided conv
@pytest.mark.parametrize("rho_in,rho_out", [(1, 8), (2, 8), (4, 8)])
def test_conv1d_folded_out_contract_matches_conv1d(rng, rho_in, rho_out, B):
    """Contracted folded-output conv (the tail) vs plain conv1d — both
    batch-dispatched formulations (§11 ninth finding)."""
    from zerovox_tpu.ops.conv import conv1d_folded_out_contract, fold
    L, Cin, K = 64, 16, 7
    pad = (K - 1) // 2
    x = rng.normal(size=(B, L, Cin)).astype(np.float32)
    w = rng.normal(size=(K, Cin, 1)).astype(np.float32)
    b = rng.normal(size=(1,)).astype(np.float32)
    ref = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), padding=pad)
    xf = fold(jnp.asarray(x), rho_in) if rho_in > 1 else jnp.asarray(x)
    got = conv1d_folded_out_contract(xf, jnp.asarray(w), jnp.asarray(b),
                                     padding=pad, rho_in=rho_in,
                                     rho_out=rho_out)
    np.testing.assert_allclose(np.asarray(got).reshape(B, -1),
                               np.asarray(ref)[..., 0], atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("B", [1, 2])   # B=1 sliced-dots path, B>1 conv path
@pytest.mark.parametrize("stride,K,Cin,Cout,rho_in,g,L", [
    (5, 10, 16, 8, 1, 1, 40),    # up0/up1 geometry (a = 1)
    (4, 8, 16, 8, 1, 1, 40),     # up2 geometry (a = 1)
    (3, 6, 16, 8, 2, 4, 48),     # up3 geometry: folded input, row stride 2
    (3, 6, 8, 8, 2, 6, 48),      # row stride 3 (lane-slice regroup)
])
def test_conv_transpose1d_grouped_matches_polyphase(rng, B, stride, K, Cin,
                                                    Cout, rho_in, g, L):
    """Grouped-row ConvTranspose (the TPU hot path feeding the fused MRF
    kernel) is exact vs the polyphase reference on both dispatch paths."""
    from zerovox_tpu.ops.conv import conv_transpose1d_grouped, fold
    pad = stride // 2 + stride % 2
    outpad = stride % 2
    w = jnp.asarray(rng.normal(size=(K, Cin, Cout)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(Cout,)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, L, Cin)), jnp.float32)
    ref = conv_transpose1d(x, w, b, stride=stride, padding=pad,
                           output_padding=outpad)
    xr = fold(x, rho_in) if rho_in > 1 else x
    got = conv_transpose1d_grouped(xr, w, b, stride=stride, padding=pad,
                                   output_padding=outpad, rho_in=rho_in, g=g)
    assert got.shape == (B, L // g, g * stride * Cout)
    np.testing.assert_allclose(np.asarray(got.reshape(B, -1, Cout)),
                               np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("stride,outpad", [(1, 2), (1, 4), (2, 2), (3, 5)])
def test_conv_transpose_rejects_outpad_geq_stride(rng, stride, outpad):
    """torch's domain rule (output_padding < stride) is enforced: outside
    it the formulations diverge (the lhs_dilation form reads out of bounds
    via negative conv padding) and the grouped builder's d_lo goes
    positive — there is no defined answer to give (review r3 #2)."""
    from zerovox_tpu.ops.conv import (conv_transpose1d,
                                      conv_transpose1d_lax,
                                      conv_transpose1d_grouped)
    K = 2 * stride
    pad = (K - stride + outpad) // 2   # keep out_len == L*stride plausible
    w = jnp.asarray(rng.normal(size=(K, 8, 8)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 24, 8)), jnp.float32)
    for fn in (conv_transpose1d, conv_transpose1d_lax):
        with pytest.raises(ValueError, match="output_padding"):
            fn(x, w, None, stride=stride, padding=pad, output_padding=outpad)
    with pytest.raises(ValueError, match="output_padding"):
        conv_transpose1d_grouped(x, w, None, stride=stride, padding=pad,
                                 output_padding=outpad, rho_in=1, g=1)
