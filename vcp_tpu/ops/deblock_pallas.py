"""Pallas TPU kernel: spec-order H.264 deblocking wavefront.

Hand-scheduled counterpart of ops.deblock's XLA wavefront (bit-identical,
asserted by tests). The filter is a serial chain of ~8*(nMBx + 2*nMBy)
dependent edge-group applications (spec 8.7 mandates per-MB raster
order); as an XLA ``fori_loop`` each tiny group pays ~0.2 ms of dispatch
(~50 ms/frame at 1080p). This kernel runs K wavefront diagonals per
grid step entirely in VMEM:

* planes and threshold grids are pre-skewed (diagonal d = mbx + 2*mby →
  contiguous strip) and TRANSPOSED so the along-edge dimension H lands on
  vector lanes,
* per step, a (32+16K, H) luma window + (16+8K, H) chroma window and
  their per-edge thresholds are DMA'd HBM→VMEM, the K diagonals run
  back-to-back in VMEM (consecutive diagonals overlap by 32 luma rows —
  the strips are shared, not duplicated, so diagonal k+1 reads k's
  writes directly from the window scratch), and the windows are DMA'd
  back before the next (dependent) step begins. Merging K diagonals
  amortizes the per-step DMA latency + grid overhead that dominated the
  one-diagonal schedule (~10 ms/frame at 1080p → ~3 ms at K=8),
* all eight luma and four chroma edge groups per diagonal are dense VPU
  work (vertical edges are row-slices; horizontal edges use lane rolls +
  anchor masks),
* out-of-range diagonals and frame/slice boundaries carry bS=0 in the
  threshold padding, making their filters identity — no masks needed
  (the tail-padding diagonals of the last step filter zeros with bS=0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deblock import filter_core_chroma, filter_core_luma


def _luma_v_edges(win, vthr, strong: bool, r0: int, t0: int):
    """Four cascaded vertical luma edges of one diagonal's MBs.

    win rows r0+0:16 top-neighbor cols, r0+16:32 left-MB cols, r0+32:48
    self cols; vthr rows t0+k carry [thr, edge_k, H].
    """
    for k in range(4):
        rr = r0 + 28 + 4 * k                 # p3 row
        seg = win[rr:rr + 8, :]
        out = filter_core_luma(
            seg[0], seg[1], seg[2], seg[3], seg[4], seg[5], seg[6], seg[7],
            vthr[0, t0 + k, :].astype(jnp.int32),
            vthr[1, t0 + k, :].astype(jnp.int32),
            vthr[2, t0 + k, :].astype(jnp.int32),
            vthr[3, t0 + k, :].astype(jnp.int32),
            strong=strong)
        if strong:
            win[rr + 1:rr + 7, :] = jnp.stack(out)
        else:                                # p2/q2 untouched when bS<4
            win[rr + 2:rr + 6, :] = jnp.stack(out[1:5])


def _roll(x, sh, n):
    """Roll lanes so value at lane l becomes x[(l + sh) mod n]."""
    return pltpu.roll(x, (n - sh) % n, axis=1)


def _luma_h_edges(win, hthr, hl: int, strong: bool, r0: int, t0: int):
    """Four horizontal luma edge groups, lane-rolled + anchor-masked.

    Anchors (edge rows) are lanes h ≡ 4k (mod 16); p-samples of the
    MB-top edge (k=0) live in the top neighbor's columns (win rows
    r0+0:16). hthr rows t0+0:16 are the thresholds at anchor lanes for
    the self MB's 16 columns.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (16, hl), 1)
    for k in range(4):
        x_self = win[r0 + 32:r0 + 48, :]
        psrc = win[r0:r0 + 16, :] if k == 0 else x_self
        p = [_roll(psrc, -i - 1, hl) for i in range(4)]       # p0..p3
        q = [_roll(x_self, i, hl) for i in range(4)]          # q0..q3
        thr = [hthr[t, t0:t0 + 16, :].astype(jnp.int32) for t in range(4)]
        op2, op1, op0, oq0, oq1, oq2 = filter_core_luma(
            p[3], p[2], p[1], p[0], q[0], q[1], q[2], q[3], *thr,
            strong=strong)
        # scatter back: sample at lane a-j takes the anchor-a value
        pw = ((1, op0), (2, op1), (3, op2)) if strong else \
            ((1, op0), (2, op1))
        qw = ((0, oq0), (1, oq1), (2, oq2)) if strong else \
            ((0, oq0), (1, oq1))
        for j, val in pw:
            m = lane % 16 == (4 * k - j) % 16
            psrc = jnp.where(m, _roll(val, j, hl), psrc)
        if k == 0:
            win[r0:r0 + 16, :] = psrc
        else:
            x_self = psrc
        for j, val in qw:
            m = lane % 16 == (4 * k + j) % 16
            x_self = jnp.where(m, _roll(val, -j, hl), x_self)
        win[r0 + 32:r0 + 48, :] = x_self


def _chroma_edges(cwin, cvthr, chthr, hl: int, r0: int, tv0: int, th0: int):
    """Two vertical + two horizontal chroma edge groups (8-px MBs,
    u and v stacked along lanes)."""
    for k in range(2):
        rr = r0 + 14 + 4 * k
        seg = cwin[rr:rr + 4, :]
        op0, oq0 = filter_core_chroma(
            seg[0], seg[1], seg[2], seg[3],
            cvthr[0, tv0 + k, :].astype(jnp.int32),
            cvthr[1, tv0 + k, :].astype(jnp.int32),
            cvthr[2, tv0 + k, :].astype(jnp.int32),
            cvthr[3, tv0 + k, :].astype(jnp.int32))
        cwin[rr + 1:rr + 3, :] = jnp.stack([op0, oq0])
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, hl), 1)
    for k in range(2):
        x_self = cwin[r0 + 16:r0 + 24, :]
        psrc = cwin[r0:r0 + 8, :] if k == 0 else x_self
        p1 = _roll(psrc, -2, hl)
        p0 = _roll(psrc, -1, hl)
        q0 = x_self
        q1 = _roll(x_self, 1, hl)
        thr = [chthr[t, th0:th0 + 8, :].astype(jnp.int32) for t in range(4)]
        op0, oq0 = filter_core_chroma(p1, p0, q0, q1, *thr)
        m = lane % 8 == (4 * k - 1) % 8
        psrc = jnp.where(m, _roll(op0, 1, hl), psrc)
        if k == 0:
            cwin[r0:r0 + 8, :] = psrc
        else:
            x_self = psrc
        x_self = jnp.where(lane % 8 == 4 * k, oq0, x_self)
        cwin[r0 + 16:r0 + 24, :] = x_self


def _kernel(act_ref, ys_ref, vthr_ref, hthr_ref, cs_ref, cvthr_ref,
            chthr_ref, ys_out, cs_out, win, vthr_s, hthr_s, cwin, cvthr_s,
            chthr_s, sems, *, hl: int, hlc: int, kdiag: int,
            strong: bool = True):
    d = pl.program_id(0)
    # whole-plane copy-in on the first step; afterwards windows are read
    # back from the OUTPUT refs so each (dependent) step sees its
    # predecessors' writes regardless of how input/output aliasing is
    # realized (on hardware they are the same HBM buffer)
    @pl.when(d == 0)
    def _():
        for src, dst, s in ((ys_ref, ys_out, 0), (cs_ref, cs_out, 3)):
            c = pltpu.make_async_copy(src, dst, sems.at[s])
            c.start()
            c.wait()

    # bS-activity gating: diagonals whose every edge carries bS=0 are
    # identity filters (spec: filterSamplesFlag false) — skipping them is
    # bit-exact. act_ref (SMEM) holds one flag per diagonal of this step;
    # a fully inactive step skips its window DMAs outright. On typical P
    # frames most MBs are skips with equal MVs and no residual, so most
    # diagonals carry bS=0 everywhere and the whole step collapses.
    step_active = act_ref[d, 0]
    for k in range(1, kdiag):
        step_active = step_active | act_ref[d, k]

    @pl.when(step_active != 0)
    def _():
        cp = [
            pltpu.make_async_copy(
                ys_out.at[pl.ds(16 * kdiag * d, 32 + 16 * kdiag), :], win,
                sems.at[0]),
            pltpu.make_async_copy(vthr_ref.at[:, d], vthr_s, sems.at[1]),
            pltpu.make_async_copy(hthr_ref.at[:, d], hthr_s, sems.at[2]),
            pltpu.make_async_copy(
                cs_out.at[pl.ds(8 * kdiag * d, 16 + 8 * kdiag), :], cwin,
                sems.at[3]),
            pltpu.make_async_copy(cvthr_ref.at[:, d], cvthr_s, sems.at[4]),
            pltpu.make_async_copy(chthr_ref.at[:, d], chthr_s, sems.at[5]),
        ]
        for c in cp:
            c.start()
        for c in cp:
            c.wait()

        for k in range(kdiag):
            @pl.when(act_ref[d, k] != 0)
            def _(k=k):
                _luma_v_edges(win, vthr_s, strong, 16 * k, 4 * k)
                _luma_h_edges(win, hthr_s, hl, strong, 16 * k, 16 * k)
                _chroma_edges(cwin, cvthr_s, chthr_s, hlc, 8 * k, 2 * k,
                              8 * k)

        wr = [
            pltpu.make_async_copy(
                win, ys_out.at[pl.ds(16 * kdiag * d, 32 + 16 * kdiag), :],
                sems.at[0]),
            pltpu.make_async_copy(
                cwin, cs_out.at[pl.ds(8 * kdiag * d, 16 + 8 * kdiag), :],
                sems.at[3]),
        ]
        for c in wr:
            c.start()
        for c in wr:
            c.wait()


# ---------------------------------------------------------------------------
# Fast path: uniform slice QP, all-inter (no bS 4) — the encoder's P/B
# frames. Thresholds collapse to ONE bS grid per edge direction plus ten
# SMEM scalars [alpha_l, beta_l, tc0_l(bS 1..3), alpha_c, beta_c,
# tc0_c(bS 1..3)] — alpha/beta/tc0 are functions of (bS, qp_av) alone and
# qp_av is the slice QP everywhere. Cuts the XLA-side grid construction
# (19 skewed threshold arrays → 7) which dominated the filter's cost.
# ---------------------------------------------------------------------------

def _tc0_sel(bs, t1, t2, t3):
    return jnp.where(bs == 1, t1, jnp.where(bs == 2, t2, t3))


def _luma_v_edges_fast(win, bsv, scal, r0: int, t0: int):
    alpha, beta = scal[0], scal[1]
    for k in range(4):
        rr = r0 + 28 + 4 * k
        seg = win[rr:rr + 8, :]
        bs = bsv[t0 + k, :].astype(jnp.int32)
        tc0 = _tc0_sel(bs, scal[2], scal[3], scal[4])
        out = filter_core_luma(
            seg[0], seg[1], seg[2], seg[3], seg[4], seg[5], seg[6], seg[7],
            bs, alpha, beta, tc0, strong=False)
        win[rr + 2:rr + 6, :] = jnp.stack(out[1:5])


def _luma_h_edges_fast(win, bsh, scal, hl: int, r0: int, t0: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (16, hl), 1)
    alpha, beta = scal[0], scal[1]
    for k in range(4):
        x_self = win[r0 + 32:r0 + 48, :]
        psrc = win[r0:r0 + 16, :] if k == 0 else x_self
        p = [_roll(psrc, -i - 1, hl) for i in range(4)]
        q = [_roll(x_self, i, hl) for i in range(4)]
        bs = bsh[t0:t0 + 16, :].astype(jnp.int32)
        tc0 = _tc0_sel(bs, scal[2], scal[3], scal[4])
        _, op1, op0, oq0, oq1, _ = filter_core_luma(
            p[3], p[2], p[1], p[0], q[0], q[1], q[2], q[3],
            bs, alpha, beta, tc0, strong=False)
        for j, val in ((1, op0), (2, op1)):
            m = lane % 16 == (4 * k - j) % 16
            psrc = jnp.where(m, _roll(val, j, hl), psrc)
        if k == 0:
            win[r0:r0 + 16, :] = psrc
        else:
            x_self = psrc
        for j, val in ((0, oq0), (1, oq1)):
            m = lane % 16 == (4 * k + j) % 16
            x_self = jnp.where(m, _roll(val, -j, hl), x_self)
        win[r0 + 32:r0 + 48, :] = x_self


def _chroma_edges_fast(cwin, bscv, bsch, scal, hl: int, r0: int,
                       tv0: int, th0: int):
    alpha, beta = scal[5], scal[6]
    for k in range(2):
        rr = r0 + 14 + 4 * k
        seg = cwin[rr:rr + 4, :]
        bs = bscv[tv0 + k, :].astype(jnp.int32)
        tc0 = _tc0_sel(bs, scal[7], scal[8], scal[9])
        op0, oq0 = filter_core_chroma(seg[0], seg[1], seg[2], seg[3],
                                      bs, alpha, beta, tc0)
        cwin[rr + 1:rr + 3, :] = jnp.stack([op0, oq0])
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, hl), 1)
    for k in range(2):
        x_self = cwin[r0 + 16:r0 + 24, :]
        psrc = cwin[r0:r0 + 8, :] if k == 0 else x_self
        p1 = _roll(psrc, -2, hl)
        p0 = _roll(psrc, -1, hl)
        q0 = x_self
        q1 = _roll(x_self, 1, hl)
        bs = bsch[th0:th0 + 8, :].astype(jnp.int32)
        tc0 = _tc0_sel(bs, scal[7], scal[8], scal[9])
        op0, oq0 = filter_core_chroma(p1, p0, q0, q1, bs, alpha, beta, tc0)
        m = lane % 8 == (4 * k - 1) % 8
        psrc = jnp.where(m, _roll(op0, 1, hl), psrc)
        if k == 0:
            cwin[r0:r0 + 8, :] = psrc
        else:
            x_self = psrc
        x_self = jnp.where(lane % 8 == 4 * k, oq0, x_self)
        cwin[r0 + 16:r0 + 24, :] = x_self


def _kernel_fast(act_ref, scal_ref, ys_ref, bsv_ref, bsh_ref, cs_ref,
                 bscv_ref, bsch_ref, ys_out, cs_out, win, bsv_s, bsh_s,
                 cwin, bscv_s, bsch_s, sems, *, hl: int, hlc: int,
                 kdiag: int):
    d = pl.program_id(0)

    @pl.when(d == 0)
    def _():
        for src, dst, s in ((ys_ref, ys_out, 0), (cs_ref, cs_out, 3)):
            c = pltpu.make_async_copy(src, dst, sems.at[s])
            c.start()
            c.wait()

    scal = [scal_ref[i] for i in range(10)]
    step_active = act_ref[d, 0]
    for k in range(1, kdiag):
        step_active = step_active | act_ref[d, k]

    @pl.when(step_active != 0)
    def _():
        cp = [
            pltpu.make_async_copy(
                ys_out.at[pl.ds(16 * kdiag * d, 32 + 16 * kdiag), :], win,
                sems.at[0]),
            pltpu.make_async_copy(bsv_ref.at[d], bsv_s, sems.at[1]),
            pltpu.make_async_copy(bsh_ref.at[d], bsh_s, sems.at[2]),
            pltpu.make_async_copy(
                cs_out.at[pl.ds(8 * kdiag * d, 16 + 8 * kdiag), :], cwin,
                sems.at[3]),
            pltpu.make_async_copy(bscv_ref.at[d], bscv_s, sems.at[4]),
            pltpu.make_async_copy(bsch_ref.at[d], bsch_s, sems.at[5]),
        ]
        for c in cp:
            c.start()
        for c in cp:
            c.wait()

        for k in range(kdiag):
            @pl.when(act_ref[d, k] != 0)
            def _(k=k):
                _luma_v_edges_fast(win, bsv_s, scal, 16 * k, 4 * k)
                _luma_h_edges_fast(win, bsh_s, scal, hl, 16 * k, 16 * k)
                _chroma_edges_fast(cwin, bscv_s, bsch_s, scal, hlc,
                                   8 * k, 2 * k, 8 * k)

        wr = [
            pltpu.make_async_copy(
                win, ys_out.at[pl.ds(16 * kdiag * d, 32 + 16 * kdiag), :],
                sems.at[0]),
            pltpu.make_async_copy(
                cwin, cs_out.at[pl.ds(8 * kdiag * d, 16 + 8 * kdiag), :],
                sems.at[3]),
        ]
        for c in wr:
            c.start()
        for c in wr:
            c.wait()


def wavefront_pallas_fast(ys, bsv, bsh, cs, bscv, bsch, scal, d_steps: int,
                          act, interpret: bool = False):
    """Uniform-QP all-inter wavefront: bS-only threshold grids (one
    channel each, same geometry as wavefront_pallas's channel 0) + ten
    SMEM scalars; always strong=False. Same padding contract as
    wavefront_pallas."""
    hl = ys.shape[1]
    hlc = cs.shape[1]
    kdiag = diags_per_step(hl)
    assert d_steps % kdiag == 0, (d_steps, kdiag)
    n_steps = d_steps // kdiag
    act = act.reshape(n_steps, kdiag).astype(jnp.int32)
    bsv = bsv.reshape(n_steps, 4 * kdiag, hl)
    bsh = bsh.reshape(n_steps, 16 * kdiag, hl)
    bscv = bscv.reshape(n_steps, 2 * kdiag, hlc)
    bsch = bsch.reshape(n_steps, 8 * kdiag, hlc)
    kernel = functools.partial(_kernel_fast, hl=hl, hlc=hlc, kdiag=kdiag)
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct(ys.shape, jnp.int32),
            jax.ShapeDtypeStruct(cs.shape, jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((32 + 16 * kdiag, hl), jnp.int32),
            pltpu.VMEM((4 * kdiag, hl), jnp.int32),
            pltpu.VMEM((16 * kdiag, hl), jnp.int32),
            pltpu.VMEM((16 + 8 * kdiag, hlc), jnp.int32),
            pltpu.VMEM((2 * kdiag, hlc), jnp.int32),
            pltpu.VMEM((8 * kdiag, hlc), jnp.int32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
    )(act, scal.astype(jnp.int32), ys, bsv, bsh, cs, bscv, bsch)


def diags_per_step(hl: int) -> int:
    """Diagonals merged per grid step: bounded by VMEM (the windows +
    threshold slabs scale with K·lanes; ~4.5 MB at 1080p for K=8)."""
    return 8 if hl <= 1536 else 4


def wavefront_pallas(ys, vthr, hthr, cs, cvthr, chthr, d_steps: int,
                     interpret: bool = False, strong: bool = True,
                     act=None):
    """Run the wavefront over pre-skewed TRANSPOSED arrays.

    ys: (Wsk, HL) int32 skewed luma, rows 16d.. hold diagonal d's strip
    (32 lead rows + 16 tail rows of padding included); vthr (4, Wsk//4,
    HL) uint8; hthr (4, Wsk, HL) uint8 anchor-lane thresholds;
    cs/cvthr/chthr: chroma equivalents ((4, 2, ...) for chthr's two
    sub-edges). The caller MUST pad d_steps (and the row extents of all
    six arrays, zero thresholds → identity filters) to a multiple of
    diags_per_step(HL). ``act`` (d_steps,) int32 flags diagonals with
    any bS>0 edge (None = all active); bS=0 diagonals are skipped
    bit-exactly. Returns filtered (ys, cs).
    """
    hl = ys.shape[1]
    hlc = cs.shape[1]
    kdiag = diags_per_step(hl)
    assert d_steps % kdiag == 0, (d_steps, kdiag)
    n_steps = d_steps // kdiag
    if act is None:
        act = jnp.ones((d_steps,), jnp.int32)
    act = act.reshape(n_steps, kdiag).astype(jnp.int32)
    # per-step leading dim: sublane slices must be 8-aligned, so the
    # threshold arrays are pre-grouped as (4, D, rows_per_step, lanes)
    vthr = vthr.reshape(4, n_steps, 4 * kdiag, hl)
    hthr = hthr.reshape(4, n_steps, 16 * kdiag, hl)
    cvthr = cvthr.reshape(4, n_steps, 2 * kdiag, hlc)
    chthr = chthr.reshape(4, n_steps, 8 * kdiag, hlc)
    kernel = functools.partial(_kernel, hl=hl, hlc=hlc, kdiag=kdiag,
                               strong=strong)
    return pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct(ys.shape, jnp.int32),
            jax.ShapeDtypeStruct(cs.shape, jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((32 + 16 * kdiag, hl), jnp.int32),
            pltpu.VMEM((4, 4 * kdiag, hl), jnp.int32),
            pltpu.VMEM((4, 16 * kdiag, hl), jnp.int32),
            pltpu.VMEM((16 + 8 * kdiag, hlc), jnp.int32),
            pltpu.VMEM((4, 2 * kdiag, hlc), jnp.int32),
            pltpu.VMEM((4, 8 * kdiag, hlc), jnp.int32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
    )(act, ys, vthr, hthr, cs, cvthr, chthr)
