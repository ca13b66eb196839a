"""Pallas kernel: fused multi-receptive-field stage on folded activations.

The XLA folded path (ops.conv.conv1d_folded) already makes the small-channel
HiFi-GAN stages lane-dense, but each of the 18 convs per stage still round-
trips its activation through HBM.  This kernel fuses one *entire* MRF stage —
three residual blocks, six convs each, leaky-relus, residual adds, and the
final (r1+r2+r3)/3 — into a single pallas_call: each folded activation tile
is DMA'd from HBM once (with halo), the whole chain runs in VMEM, and one
tile is written back.

Layout: folded (nblk, 128) activations (rho = 128/C time-steps per lane
block, see ops.conv.fold).  Each conv is a sum over block offsets delta of
dense (128, 128) MXU matmuls (the statically scattered, phase-shifted
W_delta of conv1d_folded); shifted reads are SHRINKING-WINDOW STATIC
SLICES of the VMEM tile (the r1 roll formulation was VPU-shuffle-bound),
with the halo sized to the stage's cumulative receptive field and per-tile
edge-branch DMA over the unpadded input.  The preceding transpose-conv
upsample runs in-kernel too (`upsample=`), so the upsampled activation
never exists in HBM: a == 1 stages read consecutive fetched rows, a > 1
stages read the a-grouped-reshape layout (contiguous row + lane slices).

Reference counterpart: the per-node CPU kernels + barrier loop of
ggml_graph_compute (/root/reference/ggml/src/ggml-cpu/ggml-cpu.c:13568-13820)
— here one fused kernel replaces ~40 graph nodes.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..conv import (_folded_weight_terms, build_wcontract,
                    build_wtranspose_grouped, transpose_out_len)


def _conv_schedule(k: int, rho: int, dilation: int,
                   dphase: int = 0) -> List[int]:
    """Sorted block offsets (deltas) of one folded same-length conv."""
    pad = (k - 1) // 2 * dilation
    return [d for d, _ in _folded_weight_terms(k, rho, pad, dilation, dphase)]


def _build_wdelta(w: jnp.ndarray, rho: int, dilation: int,
                  dphase: int = 0) -> jnp.ndarray:
    """(n_delta, rho*C, rho*C) stacked folded weight matrices for one conv."""
    from ..conv import build_wdelta
    k = w.shape[0]
    pad = (k - 1) // 2 * dilation
    _, W = build_wdelta(w, rho, rho, pad, dilation, dphase)
    return W


def _best_phase(k: int, rho: int, dilation: int) -> int:
    """Fold phase of the convs1->convs2 intermediate minimizing MXU passes.

    Within a conv pair the intermediate may live at ANY folded phase phi
    (slot i of block b holding timestep b*rho + i - phi): convs1 maps phase
    0 -> phi (dphase -phi), convs2 maps phi -> 0 (dphase +phi), and the
    phase choice is absorbed into the W_delta scatters at build time — no
    runtime relayout.  A good phi shrinks both delta sets: per resblock the
    production geometry drops 22 -> 16 passes at rho=2 and 20 -> 15 at
    rho=4 (~25% of the folding FLOP inflation, VERDICT r2 next #4).
    """
    def n(dd, dph):
        return len(_conv_schedule(k, rho, dd, dph))

    return min(range(rho), key=lambda p: (n(dilation, -p) + n(1, p), p))


def _leaky(x, slope=0.1):
    # max(x, s*x) == where(x>=0, x, s*x) bit-for-bit on finite values for
    # 0 < s < 1 (s*x > x iff x < 0), and is one VPU op cheaper — the stage
    # kernels run ~20 full-window leakys per tile and are partly VPU-bound
    return jnp.maximum(x, x * jnp.asarray(slope, x.dtype))


def _stage_halo(dilation_sets: Sequence[Sequence[int]], k: int, rho: int) -> int:
    """Cumulative per-side halo (in blocks) of the worst residual block."""
    worst = 0
    for dils in dilation_sets:
        h = 0
        for d in dils:
            for dd in (d, 1):                      # convs1 (dilated) + convs2
                sched = _conv_schedule(k, rho, dd)
                h += max(-sched[0], sched[-1])
        worst = max(worst, h)
    return worst


def _conv_reach(deltas):
    """(left, right) block reach of one folded conv's delta schedule."""
    return -deltas[0], deltas[-1]


def _fetch_plan(n_tiles: int, tb_f: int, halo_f: int, R_f: int, sub: int,
                halo_hi_f: int | None = None):
    """Static per-tile DMA branches over the UNPADDED input (fetch-row units).

    Tile t's window covers source rows [t*tb_f - halo_f, +win_f); edge tiles
    clip that to [0, R_f) with STATIC sizes (each edge tile gets its own
    branch), so no jnp.pad of the activation is ever needed — out-of-range
    VMEM rows stay stale and the kernel's mask_oob re-zeroes them by global
    row index (VERDICT r2 weak #3: the B=8 halo-pad/crop glue).

    Mosaic requires DMA slice offsets AND sizes on the sublane axis to be
    multiples of `sub`, so every copy is aligned DOWN to cover [start,
    align_down(R_f)); when R_f % sub != 0 the last r real rows cannot be
    DMA'd at all, and each branch whose window holds them instead patches
    them from a tiny always-in-VMEM tail input (patch_dst, row offset in the
    window — aligned because align_down(R_f) - start is).

    Branches: ("eq", t, src0, size, dst, patch_dst) — static tile; or
              ("range", lo, hi, size) — dynamic src (t*tb_f - halo_f),
              dst 0, never clipped, never patched.
    patch_dst is None when no patch is needed; size may be 0 (skip the DMA).
    """
    # halo_hi_f (default: symmetric) supports windows whose right reach
    # differs from the left — the in-kernel upsample extends the fetch
    # window by the transpose-conv's delta span on top of the chain halo
    if halo_hi_f is None:
        halo_hi_f = halo_f
    win_f = tb_f + halo_f + halo_hi_f
    R_al = R_f - R_f % sub
    r = R_f % sub

    def eq(t, start, dst):
        size = max(0, min(R_al, start + win_f - dst) - start)
        patch = None
        if r and start <= R_al and R_al - start + dst + sub <= win_f:
            patch = R_al - start + dst
            assert patch % sub == 0, (patch, sub)
        return ("eq", t, start, size, dst, patch)

    if n_tiles == 1:
        return (eq(0, 0, halo_f),)
    plan = [eq(0, 0, halo_f)]
    # largest t whose full window end (t+1)*tb_f + halo_hi_f stays <= R_al
    t_full = (R_al - halo_hi_f) // tb_f - 1
    hi = min(n_tiles - 2, t_full)
    if hi >= 1:
        plan.append(("range", 1, hi, win_f))
    for t in range(max(1, hi + 1), n_tiles):
        start = t * tb_f - halo_f
        assert 0 <= start, (n_tiles, tb_f, halo_f, R_f)
        plan.append(eq(t, start, 0))
    return tuple(plan)


def _mrf_kernel(*refs,
                schedules, halo, t_blk, inv_n, nblk, rho=1, fold_rho=1,
                dot_bf16=False,
                in_group=1, in_b=None, out_leaky=None, fetch_plan=None,
                has_tail=False, up_sched=None):
    """Grid step (b, t): window x[b, t*t_blk : t*t_blk + t_blk + 2*halo]
    -> o tile (b, t).

    The batch axis is a leading grid dimension (NOT an outer jax.vmap):
    Mosaic only lowers ANY-memory-space inputs with a trivial index map, so
    a vmapped pallas_call over the HBM ref fails to compile for B > 1; here
    the manual DMA slices the batch row itself.

    With rho > 1 the HBM array is *unfolded* (rows are rho x smaller lane
    blocks of C channels); the DMA fetches rho x the rows and the fold to
    (window, rho*C) happens as an in-VMEM reshape, so XLA never materialises
    a folded layout at the kernel boundary.

    The halo fetch is double-buffered: the next grid step's HBM->VMEM copy
    (tile t+1, or the next batch row's tile 0) is issued before this step's
    compute, so DMA overlaps the MXU chain (x_vmem/sem carry 2 slots).

    Shifted conv reads are SHRINKING-WINDOW STATIC SLICES, not rolls: each
    conv consumes its block reach from the margins, so every delta's operand
    is a static row slice of the previous intermediate.  v5e measurement vs
    the roll formulation: the stages were VPU-shuffle-bound (54 full-window
    rolls per tile), not MXU-bound; slices remove that traffic and lift the
    32-bit-data restriction rolls imposed.
    """
    refs = list(refs)
    x_hbm = refs.pop(0)
    tail_ref = refs.pop(0) if (fetch_plan is not None and has_tail) else None
    w_up_ref = refs.pop(0) if up_sched is not None else None
    w_ref, b_ref, o_ref, x_vmem, sem = refs[:5]
    opnd_ref = refs[5] if len(refs) > 5 else None

    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    i = b * nt + t                     # linear step (t fastest on TPU)
    n = pl.num_programs(0) * nt
    window = t_blk + 2 * halo

    if fetch_plan is None:
        def fetch(slot, bi, ti, wait=False):
            # padded-input path (mrf_stage_unfolded): one full-window copy;
            # with in_group > 1 the HBM rows are g-grouped (g*lanes wide, g
            # chain rows each); the DMA moves grouped rows and the regroup
            # to (window, lanes) is a free in-VMEM lane->row reshape below
            cp = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(ti * (t_blk // in_group) * rho,
                                   (window // in_group) * rho)],
                x_vmem.at[slot], sem.at[slot])
            cp.wait() if wait else cp.start()
    else:
        tb_f = t_blk // in_group * rho
        halo_f = halo // in_group * rho
        if up_sched is not None:
            # the window is in PRE-upsample rows and reaches rl_pad further
            # left to cover the transpose-conv's delta span
            halo_f = halo // in_group + up_sched[3]
        # dynamic offsets are emitted as (k)*sub with the multiply OUTERMOST:
        # Mosaic's divisibility analysis proves ti*96-8 ≡ 0 (mod 8) only in
        # the factored form (ti*12-1)*8
        sub = 16 if x_vmem.dtype in (jnp.bfloat16, jnp.float16) else 8
        assert tb_f % sub == 0 and halo_f % sub == 0, (tb_f, halo_f, sub)

        def fetch(slot, bi, ti, wait=False):
            ti = jnp.asarray(ti, jnp.int32)   # literal 0 at the first fetch
            # unpadded-input path: static edge branches clip the window to
            # the array (see _fetch_plan); exactly one branch fires per ti,
            # and wait() mirrors the same branch so the semaphore count
            # matches the copy actually issued
            def issue(src0, size, dst):
                cp = pltpu.make_async_copy(
                    x_hbm.at[bi, pl.ds(src0, size)],
                    x_vmem.at[slot, pl.ds(dst, size)], sem.at[slot])
                cp.wait() if wait else cp.start()

            for br in fetch_plan:
                if br[0] == "eq":
                    _, t0, src0, size, dst, _patch = br
                    if size:       # size 0: nothing DMA-able (tail-only tile)
                        pl.when(ti == t0)(
                            lambda src0=src0, size=size, dst=dst:
                            issue(src0, size, dst))
                else:
                    _, lo, hi, size = br
                    start = (ti * (tb_f // sub) - halo_f // sub) * sub
                    pl.when(jnp.logical_and(ti >= lo, ti <= hi))(
                        lambda size=size, start=start: issue(start, size, 0))

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        fetch(0, 0, 0)

    @pl.when(i + 1 < n)
    def _():
        nxt = i + 1
        fetch(jax.lax.rem(nxt, 2), nxt // nt, jax.lax.rem(nxt, nt))

    fetch(slot, b, t, wait=True)

    if has_tail:
        # rows [align_down(R_f), R_f) are not DMA-able (Mosaic: sublane-
        # aligned offsets AND sizes); patch them from the tiny VMEM-resident
        # tail input at each branch's static (aligned) window offset
        sub_t = tail_ref.shape[1]
        for br in fetch_plan:
            if br[0] == "eq" and br[5] is not None:
                pl.when(t == br[1])(
                    lambda patch=br[5]:
                    x_vmem.__setitem__((slot, pl.ds(patch, sub_t)),
                                       tail_ref[0]))

    # global block index of window row 0
    g0 = t * t_blk - halo

    def mask_oob(xt, off, phase=0):
        """Zero elements whose global TIMESTEP is outside [0, L): every
        conv zero-pads *its own* input at the utterance boundary (torch/ggml
        semantics), so bias-propagated halo values must be re-zeroed.

        phase 0 (the resblock chain layout) masks whole block rows.  A
        phase-shifted intermediate (see _best_phase) straddles the
        boundary WITHIN its edge rows — slot r of block g holds timestep
        g*fold_rho + r - phase — so the mask goes to timestep granularity
        via a lane iota (its last phi timesteps also spill into block row
        nblk, which the window's right halo covers)."""
        row = jax.lax.broadcasted_iota(jnp.int32, (xt.shape[0], 1), 0)
        g = g0 + off + row
        if phase == 0:
            in_range = jnp.logical_and(g >= 0, g < nblk)
            return jnp.where(in_range, xt, jnp.zeros((), xt.dtype))
        chan = xt.shape[1] // fold_rho
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, xt.shape[1]), 1) // chan
        # tstep = g*rho + slot - phase; keep the arithmetic on the (rows, 1)
        # axis and broadcast only the two compares — the VPU pays full
        # (rows, lanes) cost per op and the kernels are partly VPU-bound
        a = g * fold_rho - phase                       # (rows, 1)
        in_range = jnp.logical_and(slot >= -a, slot < nblk * fold_rho - a)
        return jnp.where(in_range, xt, jnp.zeros((), xt.dtype))

    def conv(xt, off, spec):
        """One folded conv on rows covering [off, off+len): returns
        (y, new_off) with y covering [off+rl, off+len-rr)."""
        xt = mask_oob(xt, off, spec[3] if spec[0] == "d" else 0)
        if spec[0] == "c":
            # contracted operand: lane-pack the exactly-touched windows into
            # the operand scratch, ONE dot of width `total` (= ceil(total/128)
            # MXU passes) instead of n_delta full-width passes — the W_delta
            # inflation fix.  Packing goes through a VMEM scratch ref because
            # Mosaic rejects vector concat of register slices whose sublane
            # offsets differ (the row-shifted pieces).
            _, row_start, total, pieces = spec
            rl = max(0, -min(q for q, _, _ in pieces))
            rr = max(0, max(q for q, _, _ in pieces))
            out_len = xt.shape[0] - rl - rr
            cat = 0
            for q, lo, hi in pieces:
                part = xt[rl + q: rl + q + out_len, lo:hi]
                opnd_ref[0:out_len, cat:cat + hi - lo] = part.astype(opnd_ref.dtype)
                cat += hi - lo
            opnd = opnd_ref[0:out_len, 0:total]
            w = w_ref[row_start: row_start + total]
            if not dot_bf16:
                w = w.astype(jnp.float32)
            y = jax.lax.dot_general(
                opnd, w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return y, off + rl
        _, w_start, deltas, _ph = spec
        rl, rr = _conv_reach(deltas)
        out_len = xt.shape[0] - rl - rr
        y = None
        for di, delta in enumerate(deltas):
            shifted = xt[rl + delta: rl + delta + out_len]
            if dot_bf16:
                shifted = shifted.astype(jnp.bfloat16)
                w = w_ref[w_start + di]
            else:
                w = w_ref[w_start + di].astype(jnp.float32)
            prod = jax.lax.dot_general(
                shifted, w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = prod if y is None else y + prod
        return y, off + rl

    # chain state stays f32: Mosaic rejects bf16 vector compares (leaky) and
    # the VPU work is elementwise either way; dot_bf16 narrows only the MXU
    # operands inside conv()
    cdtype = jnp.float32
    if up_sched is not None:
        # in-kernel upsample: the window holds PRE-upsample rows (1 fetched
        # row = g source timesteps -> in_group chain rows); run the
        # transpose-conv as n_d sliced dots (the B=1 XLA path's math,
        # conv.py conv_transpose1d_grouped) and regroup in VMEM — the
        # upsampled activation never exists in HBM, so the XLA upsample
        # conv, its boundary layout copies, and the kernel's own larger
        # input DMA all disappear for these stages.
        #
        # a == 1 stages (g == rho_in) read consecutive rows.  a > 1 stages
        # (production stage 4: a = 2) read row stride a, expressed via the
        # a-GROUPED-RESHAPE trick of the B=1 XLA path (conv.py:405-418):
        # the HBM input arrives pre-grouped to a*rc lanes per row, and
        # x_rows[a*Q + d] is the CONTIGUOUS lane slice
        # xg[Q + (d//a), (d%a)*rc : +rc] — each delta's operand is a static
        # row slice + lane-tile-aligned lane slice, no strided sublane read
        # and no (Mosaic-rejected) sublane->lane reshape.
        offs, rc_up, R_pre, _rl_pad, in_leaky = up_sched
        win_up = window // in_group
        xw = x_vmem[slot].astype(cdtype)
        # zero beyond-edge pre rows: the transpose conv zero-pads its input
        # (whole-row validity: the grouping is by whole source rows)
        row = jax.lax.broadcasted_iota(jnp.int32, (xw.shape[0], 1), 0)
        gpre = t * tb_f - halo_f + row
        xw = jnp.where(jnp.logical_and(gpre >= 0, gpre < R_pre), xw,
                       jnp.zeros((), cdtype))
        if in_leaky is not None:
            # the pre-upsample leaky (0.1) when the producing stage did not
            # already fuse it (stage 1: the plain input conv)
            xw = _leaky(xw, in_leaky)
        if dot_bf16:
            xw = xw.astype(jnp.bfloat16)
        acc_up = None
        for di, (ro, lo) in enumerate(offs):
            sl = xw[ro: ro + win_up, lo: lo + rc_up]
            w = w_up_ref[di]
            if not dot_bf16:
                w = w.astype(cdtype)
            y = jax.lax.dot_general(
                sl, w, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_up = y if acc_up is None else acc_up + y
        # regroup (win_up, in_group*lanes) -> (window, lanes) chain rows
        x = acc_up.reshape(window, acc_up.shape[-1] // in_group)
    else:
        x = x_vmem[slot]
        if in_group > 1:
            x = x.reshape(window, x.shape[-1] // in_group)  # in-VMEM regroup
        if rho > 1:
            x = x.reshape(window, rho * x.shape[-1])   # in-VMEM fold
        x = x.astype(cdtype)
    if in_b is not None:
        # fused input bias (the preceding upsample's): adding it here on the
        # loaded window removes the unfused whole-activation bias pass that
        # followed conv_transpose1d_grouped in XLA (~0.6 ms of the B=8 run).
        # Stale/out-of-range halo rows pick the bias up too, but mask_oob
        # already re-zeroes those at every conv input by global row index.
        x = x + b_ref[in_b].astype(cdtype)
    acc = None
    acc_off = None
    for rb_schedule in schedules:
        h, off = x, 0
        for (c1_spec, c1_b, c2_spec, c2_b) in rb_schedule:
            xt = _leaky(h)
            xt, o1 = conv(xt, off, c1_spec)
            xt = (xt + b_ref[c1_b].astype(jnp.float32)).astype(cdtype)
            xt = _leaky(xt)
            xt, o2 = conv(xt, o1, c2_spec)
            xt = (xt + b_ref[c2_b].astype(jnp.float32)).astype(cdtype)
            # align the residual to xt's (smaller) coverage
            lead = o2 - off
            h = h[lead: lead + xt.shape[0]] + xt
            off = o2
        if acc is None:
            acc, acc_off = h, off
        else:  # align resblock outputs before summing
            if off > acc_off:
                acc = acc[off - acc_off: off - acc_off + h.shape[0]]
                acc_off = off
            elif acc_off > off:
                h = h[acc_off - off: acc_off - off + acc.shape[0]]
            n_rows = min(acc.shape[0], h.shape[0])
            acc = acc[:n_rows] + h[:n_rows]
    start = halo - acc_off
    out = (acc.astype(jnp.float32)
           * jnp.asarray(inv_n, jnp.float32))[start:start + t_blk]
    if out_leaky is not None:
        # the stage output always feeds a leaky-relu (0.1 before the next
        # upsample, 0.01 before the output conv); applying it here on the
        # f32 accumulator removes an unfused elementwise HBM pass per stage
        out = _leaky(out, out_leaky)
    if rho > 1:
        out = out.reshape(t_blk * rho, out.shape[-1] // rho)  # in-VMEM unfold
    o_ref[0] = out.astype(o_ref.dtype)


def folded_mrf_stage(xf: jnp.ndarray,
                     blocks: Sequence[dict],
                     dilation_sets: Sequence[Sequence[int]],
                     kernel_size: int,
                     rho: int,
                     t_blk: int = 2048,
                     interpret: bool | None = None,
                     dot_bf16: bool | None = None,
                     contract: bool | None = None,
                     in_group: int = 1,
                     in_bias: jnp.ndarray | None = None,
                     upsample: dict | None = None,
                     out_leaky: float | None = None) -> jnp.ndarray:
    """Fused MRF stage on a folded activation.

    in_group = g > 1 accepts the activation as g-GROUPED rows
    (B, nblk/g, g*lanes) — the layout conv_transpose1d_grouped produces —
    and regroups to (window, lanes) chain rows inside the kernel (free
    in-VMEM reshape), so no XLA relayout ever materialises between an
    upsample and its MRF stage.  Output stays ungrouped (B, nblk, lanes).

    upsample (a dict: w (K, Cin, Cout) flipped transpose kernel, stride,
    padding, output_padding, rho_in, optional g (default rho_in), in_leaky)
    runs the preceding ConvTranspose1d INSIDE the kernel: xf is then the
    PRE-upsample activation grouped to g source timesteps per row
    (B, L_src/g, g*Cin) — for a = g/rho_in == 1 that is the producing
    stage's own folded layout; for a > 1 (production stage 4) the caller
    pre-groups with one XLA row-major reshape, and every delta's operand
    becomes a contiguous row slice + lane slice of the fetched window (the
    a-grouped-reshape trick of conv_transpose1d_grouped's B=1 path,
    conv.py:405-418) — no strided sublane read, no sublane->lane reshape.
    The fetch window extends by the transpose-conv's row reach (asymmetric
    halo) and the upsample is n_up sliced dots followed by the in-VMEM
    regroup — the upsampled activation never exists in HBM.  in_leaky
    applies the pre-upsample leaky-relu in-kernel when the producing stage
    didn't fuse it.  Pass the upsample bias via in_bias (it lands after
    the regroup, where the lane pattern is the same tile(b, rho) as every
    conv bias).

    in_bias (a (C,) vector) is added to the loaded input window before the
    chain runs — the preceding upsample's bias, whose unfused XLA add was a
    full extra HBM pass over the largest activations (~0.6 ms at B=8).  The
    channel pattern tiles to any lane grouping (period C divides every row
    width), so it composes with in_group and the ing=3 XLA regroup alike;
    out-of-range rows are re-zeroed by mask_oob exactly as before.  The add
    happens on the f32 chain (the XLA path added in the activation dtype):
    f32 parity path bit-identical, bf16 serving path sub-ulp.

    xf: (B, nblk, 128); blocks: list of resblock param dicts
    ({"convs1": [{"w","b"}..], "convs2": [...]}); dilation_sets[j] are the
    convs1 dilations of resblock j.  Returns (B, nblk, 128):
    sum_j resblock_j(xf) / len(blocks), matching the XLA folded path.

    dot_bf16 (default: on iff xf is bf16) feeds the MXU bf16 operands with
    f32 accumulation — the bf16-serving numerics of the XLA folded path and
    ~3x the f32 MXU rate.  The f32 parity path keeps f32 dots.

    out_leaky (default None) applies a leaky-relu with that slope to the
    stage output on the f32 accumulator before the final cast — the stage
    output always feeds one (0.1 pre-upsample / 0.01 pre-output-conv), and
    fusing it here removes an unfused elementwise HBM pass per stage.
    Ordering note (ADVICE r2): the unfused path applies leaky AFTER the cast
    to the output dtype, so on the bf16 serving path the fused form can
    differ by up to ~2 bf16 ulps of the scaled value (one ulp from rounding
    the pre-slope value, one from the final cast;
    tests/test_pallas.py::test_out_leaky_bf16_ordering pins it).  The f32
    parity path is exact.

    contract (default OFF) replaces each conv's n_delta full-width W_delta
    passes by ONE dot against the lane-packed exactly-touched input windows
    (ops.conv.build_wcontract) — cutting the folding FLOP inflation ~1.7x in
    MXU passes (stage C=32: 60 -> 42 per tile; C=64: 72 -> 42).  Measured on
    v5e it LOSES: the pack must round-trip through a VMEM scratch (Mosaic
    rejects vector concat of register slices with differing sublane offsets),
    and that store+load sits on the critical path — C=64 stage 0.98 -> 1.80 ms,
    C=32 stage 1.43 -> 2.34 ms.  Kept as an experimental flag; the W_delta
    inflation is cheaper than operand repacking on this hardware.
    """
    B, nrows_in, lanes_in = xf.shape
    nblk = nrows_in * in_group
    if upsample is not None:
        # xf is the PRE-upsample activation, grouped to g source timesteps
        # per row: (B, R_pre/a, g*Cin) where g = a*rho_in (for a == 1 that
        # is the producing stage's own rho_in-folded layout; for a > 1 the
        # caller pre-groups with ONE XLA row-major reshape of the a-times-
        # smaller pre-upsample activation).  1 fetched row -> in_group
        # chain rows; the upsampled activation never exists outside the
        # kernel.
        K_up, Cin_up, Cout_up = upsample["w"].shape
        rho_in_up = upsample["rho_in"]
        g_up = upsample.get("g", rho_in_up)
        s_up = upsample["stride"]
        assert g_up % rho_in_up == 0, (g_up, rho_in_up)
        a_up = g_up // rho_in_up
        assert lanes_in == g_up * Cin_up, (lanes_in, g_up, Cin_up)
        assert in_group * max(rho, 1) == g_up * s_up, \
            "in_group must be g*stride/rho"
        L_up = transpose_out_len(nrows_in * g_up, s_up, K_up,
                                 upsample["padding"],
                                 upsample["output_padding"])
        assert L_up == nrows_in * g_up * s_up, \
            "in-kernel upsample requires the standard same-multiple geometry"
        lanes = g_up * s_up * Cout_up // in_group      # == rho * Cout
    else:
        lanes = lanes_in // in_group
    n_rb = len(blocks)

    # keep the VMEM footprint (f32 chain registers + double-buffered window)
    # constant across lane widths: the C=256 stage's 2-lane-tile chain OOMs
    # scoped vmem at the 128-lane stages' tile length
    t_blk = t_blk * 128 // max(lanes, 128)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if dot_bf16 is None:
        dot_bf16 = xf.dtype == jnp.bfloat16
    if contract is None:
        contract = False

    # ---- static schedules + stacked weights/biases --------------------
    w_mats, b_vecs, schedules = [], [], []
    w_rows = 0                                    # rows used in contract mode
    halo = 0
    for j, blk in enumerate(blocks):
        rb_sched = []
        rb_halo = 0
        for d_idx, dilation in enumerate(dilation_sets[j]):
            specs = []
            # phase of the convs1 -> convs2 intermediate: fewer MXU passes,
            # absorbed into the weight scatters (see _best_phase); the
            # contract path keeps phase 0 (its pieces assume it)
            phi = 0 if (contract or rho == 1) else _best_phase(
                kernel_size, rho, dilation)
            for cset, dd, dph, ph_in in (("convs1", dilation, -phi, 0),
                                         ("convs2", 1, phi, phi)):
                conv = blk[cset][d_idx]
                if contract:
                    pieces, W = build_wcontract(conv["w"], rho, dd)
                    specs.append(("c", w_rows, W.shape[0], tuple(pieces)))
                    w_mats.append(W)
                    w_rows += W.shape[0]
                    rb_halo += max(max(0, -min(q for q, _, _ in pieces)),
                                   max(0, max(q for q, _, _ in pieces)))
                else:
                    mats = _build_wdelta(conv["w"], rho, dd, dph)
                    deltas = _conv_schedule(kernel_size, rho, dd, dph)
                    specs.append(("d", len(w_mats), tuple(deltas), ph_in))
                    w_mats.extend(mats[i] for i in range(mats.shape[0]))
                    rb_halo += max(-deltas[0], deltas[-1])
                specs.append(len(b_vecs))
                b_vecs.append(jnp.tile(conv["b"], rho))
            rb_sched.append(tuple(specs))          # (c1_spec, c1_b, c2_spec, c2_b)
        schedules.append(tuple(rb_sched))
        halo = max(halo, rb_halo)

    in_b_idx = None
    if in_bias is not None:
        in_b_idx = len(b_vecs)
        b_vecs.append(jnp.tile(in_bias, rho))
    if contract:
        w_all = jnp.concatenate(w_mats, axis=0)   # (sum_total, 128)
    else:
        w_all = jnp.stack(w_mats)                 # (n_w, 128, 128)
    b_all = jnp.stack(b_vecs)                     # (n_b, 128)
    # round up so DMA slices stay sublane-aligned; with grouped input the
    # DMA works in g-grouped rows, so halo and t_blk must also divide by g
    # with the QUOTIENT sublane-aligned
    sublane = 16 if xf.dtype in (jnp.bfloat16, jnp.float16) else 8
    unit = sublane * in_group
    halo = -(-halo // unit) * unit
    t_blk = max(unit, (t_blk // unit) * unit)
    t_blk = max(t_blk, halo)   # edge-branch DMA needs tile starts >= 0

    # ---- in-kernel upsample statics (a == 1 grouped stages) -----------
    up_sched = w_up = None
    rl_pad = rr_pad = 0
    if upsample is not None:
        assert not contract, "in-kernel upsample + contract mode unsupported"
        d_lo, w_up = build_wtranspose_grouped(
            upsample["w"], upsample["stride"], upsample["padding"],
            g_up, rho_in_up)
        n_up = w_up.shape[0]
        # output row Q reads rho_in-folded source rows a*Q + d_lo + d; in
        # the a-grouped fetched layout that is row Q + (d_lo+d)//a, lane
        # slice ((d_lo+d)%a)*rc (floor semantics keep negative rows in the
        # left halo).  For a == 1 this degenerates to consecutive rows at
        # lane 0.  Pad the fetch window (sublane-aligned) to the row reach.
        rc_up = rho_in_up * Cin_up
        qs = [(d_lo + d) // a_up for d in range(n_up)]
        ps = [(d_lo + d) % a_up for d in range(n_up)]
        rl = max(0, -min(qs))
        rr = max(0, max(qs))
        rl_pad = -(-rl // sublane) * sublane
        rr_pad = -(-rr // sublane) * sublane
        t_blk = max(t_blk, halo + rl_pad * in_group)
        t_blk = -(-t_blk // unit) * unit
        up_sched = (tuple((rl_pad + q, p * rc_up) for q, p in zip(qs, ps)),
                    rc_up, nrows_in, rl_pad, upsample.get("in_leaky"))
    n_tiles = -(-nblk // t_blk)

    # the input is consumed UNPADDED: per-tile DMA branches clip the halo
    # window to the array (static sizes per edge tile) and mask_oob re-zeroes
    # the stale VMEM rows, so the former jnp.pad (a full HBM copy of the
    # activation, ~1.3 ms of the B=8 run) never happens
    g = in_group
    plan = _fetch_plan(n_tiles, t_blk // g, halo // g + rl_pad, nrows_in,
                       sublane, halo_hi_f=halo // g + rr_pad)
    has_tail = any(br[0] == "eq" and br[5] is not None for br in plan)
    if has_tail:
        # sub-sublane remainder rows, passed as a whole-block VMEM input and
        # patched into the window by the kernel (O(B*sublane) copy, vs the
        # former whole-activation pad)
        r = nrows_in % sublane
        tail = jnp.pad(xf[:, nrows_in - r:], ((0, 0), (0, sublane - r),
                                              (0, 0)))

    kern = functools.partial(
        _mrf_kernel, schedules=tuple(schedules), halo=halo, t_blk=t_blk,
        inv_n=1.0 / n_rb, nblk=nblk, fold_rho=rho, dot_bf16=dot_bf16,
        in_group=in_group, in_b=in_b_idx,
        out_leaky=out_leaky, fetch_plan=plan, has_tail=has_tail,
        up_sched=up_sched)

    scratch = [
        pltpu.VMEM((2, (t_blk + 2 * halo) // g + rl_pad + rr_pad, lanes_in),
                   xf.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if contract:
        max_total = max(spec[2]
                        for rb in schedules for cs in rb
                        for spec in (cs[0], cs[2]))
        scratch.append(pltpu.VMEM(
            (t_blk + 2 * halo, max_total),
            jnp.bfloat16 if dot_bf16 else jnp.float32))

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]     # x stays in HBM
    if has_tail:
        in_specs.append(pl.BlockSpec((1, sublane, lanes_in),
                                     lambda b, t: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
    if w_up is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # upsample W
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.VMEM),         # weights, whole
        pl.BlockSpec(memory_space=pltpu.VMEM),         # biases, whole
    ]

    call = pl.pallas_call(
        kern,
        grid=(B, n_tiles),                             # batch rides the grid
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, t_blk, lanes), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        # exact rows: Pallas clips the ragged last tile on copy-out, so the
        # former out[:, :nblk] crop (another full HBM copy at B=8) is gone
        out_shape=jax.ShapeDtypeStruct((B, nblk, lanes), xf.dtype),
        scratch_shapes=scratch,
        # the f32 chain registers + double-buffered window exceed Mosaic's
        # default 16 MB scoped-vmem budget at t_blk >= 2048; v5e VMEM is
        # larger — lift the soft limit so tile length trades VMEM for
        # per-tile fixed overhead (measured dominant, ARCHITECTURE §11)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
        interpret=interpret,
    )

    args = [xf]
    if has_tail:
        args.append(tail)
    if w_up is not None:
        args.append(w_up)
    return call(*args, w_all, b_all)


def mrf_stage_unfolded(x: jnp.ndarray,
                       blocks: Sequence[dict],
                       dilation_sets: Sequence[Sequence[int]],
                       kernel_size: int,
                       rho: int,
                       t_blk: int = 512,
                       interpret: bool | None = None) -> jnp.ndarray:
    """Fused MRF stage consuming/producing *unfolded* (B, L, C) activations.

    Same math as folded_mrf_stage, but the fold/unfold happens as an in-VMEM
    reshape inside the kernel, so XLA never inserts layout copies for a
    folded array at the custom-call boundary.

    EXPERIMENTAL: exact in interpret mode, but Mosaic currently rejects the
    in-kernel sublane->lane reshape on real TPUs ("infer-vector-layout:
    unsupported shape cast"); use folded_mrf_stage there.
    """
    B, L, C = x.shape
    assert L % rho == 0
    nblk = L // rho
    n_rb = len(blocks)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    w_mats, b_vecs, schedules = [], [], []
    for j, blk in enumerate(blocks):
        rb_sched = []
        for d_idx, dilation in enumerate(dilation_sets[j]):
            specs = []
            for cset, dd in (("convs1", dilation), ("convs2", 1)):
                conv = blk[cset][d_idx]
                mats = _build_wdelta(conv["w"], rho, dd)
                deltas = _conv_schedule(kernel_size, rho, dd)
                specs.append(("d", len(w_mats), tuple(deltas), 0))
                specs.append(len(b_vecs))
                w_mats.extend(mats[i] for i in range(mats.shape[0]))
                b_vecs.append(jnp.tile(conv["b"], rho))
            rb_sched.append(tuple(specs))
        schedules.append(tuple(rb_sched))
    w_all = jnp.stack(w_mats)
    b_all = jnp.stack(b_vecs)

    halo = _stage_halo(dilation_sets, kernel_size, rho)
    sublane = 16 if x.dtype in (jnp.bfloat16, jnp.float16) else 8
    halo = -(-halo // sublane) * sublane
    n_tiles = -(-nblk // t_blk)
    padded = n_tiles * t_blk

    xpad = jnp.pad(x, ((0, 0), (halo * rho, (halo + padded - nblk) * rho),
                       (0, 0)))

    kern = functools.partial(
        _mrf_kernel, schedules=tuple(schedules), halo=halo, t_blk=t_blk,
        inv_n=1.0 / n_rb, nblk=nblk, rho=rho)

    call = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_blk * rho, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, padded * rho, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, (t_blk + 2 * halo) * rho, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )

    out = call(xpad, w_all, b_all)
    return out[:, :L]
