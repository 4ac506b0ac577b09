"""Pallas TPU kernel: deblocking edge-chain scan.

The in-loop filter's edge chain (ops.deblock._edge_scan) is inherently
sequential — edge k's output feeds edge k+1's input 4 samples away — and
each step touches only a (4, L) block. As an XLA scan that costs ~30 µs
per step in loop/op dispatch (~35 ms/frame at 1080p, ~1100 steps); inside
one Pallas kernel the same chain is ~0.3 µs/step of pure VPU work:

* grid = blocks of 4 samples across the chain direction; the carried
  block lives in a VMEM scratch that persists across grid steps (the TPU
  grid is sequential),
* per step the next block arrives via the normal blocked pipeline
  (Pallas double-buffers the HBM loads automatically), the shared
  filter cores (ops.deblock.filter_core_*) run on (1, L) rows, the
  filtered left block streams out, and the right block replaces the
  carry,
* bS/alpha/beta/tc0 are pre-looked-up per edge OUTSIDE the kernel
  (gathers from the 52-entry spec tables are XLA-friendly but not
  Mosaic-friendly).

Bit-identical to the XLA scan path (asserted by tests, incl. interpret
mode); dispatched from ops.deblock._edge_scan on TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import deblock as dbf


def _kernel(nxt_ref, first_ref, edge_ref, out_ref,
            carry_ref, *, n_edges: int, luma: bool):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        carry_ref[...] = first_ref[0]

    @pl.when(k < n_edges)
    def _filter():
        carry = carry_ref[...]                     # (4, L)
        nxt = nxt_ref[0]                           # (4, L)
        e = edge_ref[0]                            # (4, L): bs/al/be/tc0
        bs = e[0:1]
        al, be, tc = e[1:2], e[2:3], e[3:4]
        if luma:
            p3, p2, p1, p0 = (carry[i:i + 1] for i in range(4))
            q0, q1, q2, q3 = (nxt[i:i + 1] for i in range(4))
            op2, op1, op0, oq0, oq1, oq2 = dbf.filter_core_luma(
                p3, p2, p1, p0, q0, q1, q2, q3, bs, al, be, tc)
            out_ref[0] = jnp.concatenate([p3, op2, op1, op0], axis=0)
            carry_ref[...] = jnp.concatenate([oq0, oq1, oq2, q3], axis=0)
        else:
            p1, p0 = carry[2:3], carry[3:4]
            q0, q1 = nxt[0:1], nxt[1:2]
            op0, oq0 = dbf.filter_core_chroma(p1, p0, q0, q1, bs, al, be, tc)
            out_ref[0] = jnp.concatenate([carry[0:2], p1, op0], axis=0)
            carry_ref[...] = jnp.concatenate([oq0, nxt[1:4]], axis=0)

    @pl.when(k == n_edges)
    def _flush():
        out_ref[0] = carry_ref[...]


def edge_scan_pallas(blocks, bs_edges, alpha, beta, tc0, luma: bool,
                     interpret: bool = False):
    """Drop-in replacement for ops.deblock._edge_scan (same contract:
    blocks (n_blocks, 4, L) int32, bs/alpha/beta/tc0 (n_blocks-1, L);
    returns the filtered blocks, bit-identical)."""
    n_blocks, _, l = blocks.shape
    n_edges = n_blocks - 1
    # one (n_edges, 4, L) array = one DMA per step for all thresholds
    edges = jnp.stack([jnp.asarray(a, jnp.int32)
                       for a in (bs_edges, alpha, beta, tc0)], axis=1)

    edge_spec = pl.BlockSpec((1, 4, l),
                             lambda k: (jnp.minimum(k, n_edges - 1), 0, 0),
                             memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, n_edges=n_edges, luma=luma)
    bi = jnp.asarray(blocks, jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 4, l),
                         lambda k: (jnp.minimum(k + 1, n_blocks - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, l), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            edge_spec,
        ],
        out_specs=pl.BlockSpec((1, 4, l), lambda k: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 4, l), jnp.int32),
        scratch_shapes=[pltpu.VMEM((4, l), jnp.int32)],
        interpret=interpret,
    )(bi, bi, edges)
