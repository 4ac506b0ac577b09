"""Pallas TPU kernel: full-pel exhaustive SAD motion search.

Hand-scheduled counterpart of ``ops.motion.full_search`` (bit-identical
results, asserted by tests). Why a kernel: the XLA formulation re-streams
the reference plane from HBM once per window offset ((2R+1)^2 times); this
kernel pins one macroblock row's search window in VMEM and runs the whole
window scan on-chip:

* grid = MB rows; per step the current row (16, W) arrives via the normal
  blocked pipeline while the (16+2R, W+2R) reference window is DMA'd
  HBM→VMEM once (async copy + semaphore),
* per offset: |cur − window| on the VPU, sublane-reduced to column sums,
  then segment-summed per MB with one small MXU matmul (f32 exact for
  SAD < 2^24),
* argmin carried in VMEM across the fori_loop, exactly matching the XLA
  path's first-minimum tie-break (same offset order).

HBM traffic: cur row + window once per MB row ≈ 2 planes/frame vs
~(2R+1)^2/8 planes for the XLA version.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cur_ref, lam_ref, ref_hbm, mv_ref, win_ref, cost_ref,
            best_ref, seg_ref, sem, *, sr: int, w: int, n_mbx: int,
            wpad: int):
    _search_impl(cur_ref, ref_hbm, seg_ref, lam_ref, mv_ref, win_ref,
                 cost_ref, best_ref, sem, sr=sr, w=w, n_mbx=n_mbx,
                 wpad=wpad)


def _kernel_pred(cur_ref, lam_ref, ref_hbm, mv_ref, pred_ref, win_ref,
                 cost_ref, best_ref, seg_ref, segt_ref, csel_ref, sem, *,
                 sr: int, w: int, n_mbx: int, wpad: int):
    _search_impl(cur_ref, ref_hbm, seg_ref, lam_ref, mv_ref, win_ref,
                 cost_ref, best_ref, sem, sr=sr, w=w, n_mbx=n_mbx,
                 wpad=wpad, pred_ref=pred_ref, segt_ref=segt_ref,
                 csel_ref=csel_ref)


def _search_impl(cur_ref, ref_hbm, seg_ref, lam_ref, mv_ref, win_ref,
                 cost_ref, best_ref, sem, *, sr: int, w: int, n_mbx: int,
                 wpad: int, pred_ref=None, segt_ref=None, csel_ref=None):
    i = pl.program_id(0)
    side = 2 * sr + 1
    rows = 16 + 2 * sr

    # DMA this MB row's search window (rows, wpad) into VMEM; the input is
    # pre-padded to lane-aligned width, the padding tail is sliced away
    # after the rotates.
    dma = pltpu.make_async_copy(
        ref_hbm.at[pl.ds(i * 16, rows), :], win_ref, sem)
    dma.start()

    # The segment-sum matrices live in VMEM SCRATCH, built once on the
    # first grid step (scratch persists across steps). As pipelined
    # INPUTS they were re-copied HBM->VMEM on every step — ~920 KB x 68
    # steps at 1080p, which dominated the whole kernel (~400 us/step of
    # pure block-copy vs ~25 us of math).
    @pl.when(i == 0)
    def _init_seg():
        colv = jax.lax.broadcasted_iota(jnp.int32, (w, n_mbx), 0) // 16
        mbv = jax.lax.broadcasted_iota(jnp.int32, (w, n_mbx), 1)
        seg_ref[:] = (colv == mbv).astype(jnp.float32)
        if segt_ref is not None:
            colt = jax.lax.broadcasted_iota(jnp.int32, (n_mbx, w), 1) // 16
            mbt = jax.lax.broadcasted_iota(jnp.int32, (n_mbx, w), 0)
            segt_ref[:] = (colt == mbt).astype(jnp.float32)

    dma.wait()

    cur = cur_ref[:]                                 # (16, w) int32
    win = win_ref[:]                                 # (rows, wpad)
    lam_f = lam_ref[0, 0].astype(jnp.float32)

    def body_dy(dy, _):
        # hoist the (rows, wpad) sublane rotate out of the dx scan: one
        # row-shift per dy; the dx dimension is statically unrolled and
        # its 17 per-offset segment sums batch into ONE MXU matmul —
        # per-offset MXU invocations were the dominant cost of the
        # original one-dot-per-offset schedule.
        rowshift = pltpu.roll(win, rows - dy, axis=0)[:16, :]
        colsums = []
        for dx in range(side):
            window_i = pltpu.roll(rowshift, wpad - dx, axis=1)[:, :w]
            diff = jnp.abs(cur - window_i)           # VPU, int32
            colsums.append(jnp.sum(diff, axis=0).astype(jnp.float32))
        cs = jnp.stack(colsums, axis=0)              # (side, w)
        # HIGHEST precision: the MXU rounds f32 inputs to bf16 by
        # default, and column sums need 12 mantissa bits — bf16 rounding
        # flips argmin ties on smooth content vs the exact-integer XLA
        # path.
        sads = jnp.dot(cs, seg_ref[:],
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)  # (side, n_mbx)
        dxs = jax.lax.broadcasted_iota(jnp.int32, (side, 1), 0)
        costs = sads + lam_f * (jnp.abs(dxs - sr).astype(jnp.float32)
                                + jnp.abs(dy - sr).astype(jnp.float32))
        # first-minimum tie-break in offset order: strict < scanning dx
        # ascending, then strict < against the running best
        row_best = jnp.min(costs, axis=0, keepdims=True)    # (1, n_mbx)
        row_arg = jnp.argmin(costs, axis=0)[None, :]        # first min
        better = row_best < cost_ref[:]
        cost_ref[:] = jnp.where(better, row_best, cost_ref[:])
        best_ref[:] = jnp.where(better, dy * side + row_arg, best_ref[:])
        return 0

    cost_ref[:] = jnp.full((1, n_mbx), 3.0e9, jnp.float32)
    best_ref[:] = jnp.zeros((1, n_mbx), jnp.int32)
    jax.lax.fori_loop(0, side, body_dy, 0)

    best = best_ref[:]                               # (1, n_mbx)
    mv_ref[0, 0, :] = (best // side - sr)[0, :]      # dy
    mv_ref[0, 1, :] = (best % side - sr)[0, :]       # dx

    if pred_ref is not None:
        # fused MC, reconstructed AFTER the search with separable
        # row/column shift-selects (2·side masked rolls) instead of
        # per-(dy,dx) hit-writes inside the scan (side² of them) —
        # the masks depend only on the winning MB column, so each axis
        # selects independently.
        # Column pass FIRST: after it, lanes are output columns, so the
        # row pass's per-winning-MB mask is unambiguous. (Row-first is
        # wrong: a ref column inside the search margin serves two
        # adjacent MBs with different winning dy.)
        # Both passes are fori_loops writing through a VMEM scratch ref
        # (csel_ref), not unrolled SSA selects: unrolled, XLA keeps every
        # (rows, w) shifted copy live on the scoped-VMEM stack at once —
        # ~20 MB at 4K (side=33), a compile-time VMEM OOM.
        def lanes_of(mb_mask):
            return jnp.dot(mb_mask.astype(jnp.float32), segt_ref[:],
                           preferred_element_type=jnp.float32) > 0
        dyb = best // side                           # (1, n_mbx)
        dxb = best % side

        def body_dx(dx, _):
            cshift = pltpu.roll(win, wpad - dx, axis=1)[:, :w]
            csel_ref[:] = jnp.where(lanes_of(dxb == dx), cshift,
                                    csel_ref[:])
            return 0

        csel_ref[:] = jnp.zeros((rows, w), jnp.int32)
        jax.lax.fori_loop(0, side, body_dx, 0)

        def body_dyp(dy, _):
            rshift = pltpu.roll(csel_ref[:], rows - dy, axis=0)[:16, :]
            pred_ref[:] = jnp.where(lanes_of(dyb == dy), rshift,
                                    pred_ref[:])
            return 0

        pred_ref[:] = jnp.zeros((16, w), jnp.int32)
        jax.lax.fori_loop(0, side, body_dyp, 0)


def full_search_pallas(cur, ref, search_range: int, lam=4,
                       interpret: bool = False, with_pred: bool = False):
    """Drop-in replacement for motion.full_search (returns mv (nMBy,
    nMBx, 2) [dy, dx], bit-identical to the XLA version). ``lam`` may be
    a traced scalar (rate-control lambda); it rides in SMEM.

    with_pred=True additionally returns the full-pel motion-compensated
    prediction (H, W) int32 — identical to motion.mc_luma(ref, mv, sr)
    but produced inside the kernel while the window is VMEM-resident,
    which removes the (slow, scalar-gather) standalone MC pass."""
    sr = int(search_range)
    h, w = cur.shape
    n_mby, n_mbx = h // 16, w // 16

    wpad = -(-(w + 2 * sr) // 128) * 128
    ref_pad = jnp.pad(jnp.asarray(ref).astype(jnp.int32),
                      ((sr, sr), (sr, wpad - w - sr)), mode="edge")
    # segment-sum matrix: (w, n_mbx), S[c, m] = 1 iff c // 16 == m
    lam_arr = jnp.asarray(lam, jnp.int32).reshape(1, 1)
    # seg matrices live in VMEM scratch, built in-kernel on step 0: as
    # pipelined inputs with a constant index_map they were re-copied
    # HBM->VMEM on EVERY grid step (~920 KB x 68 steps at 1080p — the
    # dominant cost of the whole kernel)
    scratch = [
        pltpu.VMEM((16 + 2 * sr, wpad), jnp.int32),
        pltpu.VMEM((1, n_mbx), jnp.float32),
        pltpu.VMEM((1, n_mbx), jnp.int32),
        pltpu.VMEM((w, n_mbx), jnp.float32),           # seg
    ]
    base_specs = [
        pl.BlockSpec((16, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),             # padded ref, DMA'd
    ]
    mv_spec = pl.BlockSpec((1, 2, n_mbx), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    mv_shape = jax.ShapeDtypeStruct((n_mby, 2, n_mbx), jnp.int32)
    cur_i = jnp.asarray(cur).astype(jnp.int32)

    if with_pred:
        kernel = functools.partial(_kernel_pred, sr=sr, w=w, n_mbx=n_mbx,
                                   wpad=wpad)
        mv2, pred = pl.pallas_call(
            kernel,
            grid=(n_mby,),
            in_specs=base_specs,
            out_specs=[mv_spec,
                       pl.BlockSpec((16, w), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[mv_shape, jax.ShapeDtypeStruct((h, w), jnp.int32)],
            scratch_shapes=scratch + [
                pltpu.VMEM((n_mbx, w), jnp.float32),   # segt
                pltpu.VMEM((16 + 2 * sr, w), jnp.int32),  # csel
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(cur_i, lam_arr, ref_pad)
        return jnp.stack([mv2[:, 0], mv2[:, 1]], axis=-1), pred

    kernel = functools.partial(_kernel, sr=sr, w=w, n_mbx=n_mbx, wpad=wpad)
    mv2 = pl.pallas_call(
        kernel,
        grid=(n_mby,),
        in_specs=base_specs,
        out_specs=mv_spec,
        out_shape=mv_shape,
        scratch_shapes=scratch + [pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(cur_i, lam_arr, ref_pad)
    return jnp.stack([mv2[:, 0], mv2[:, 1]], axis=-1)
