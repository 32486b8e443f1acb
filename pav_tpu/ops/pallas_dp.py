"""Pallas TPU kernel for the full-width affine DP classes.

The small/medium segment classes (size <= 256) run full-width DP (window =
whole row, offset 0 for every row) — the bulk of all segments. This kernel
keeps the three band-state vectors (H, E1, E2) in VMEM across the row loop and
emits the packed traceback rows straight to the output buffer, avoiding the
XLA path's per-row HBM round trips and dynamic-shift gathers. The banded
(moving-window) classes stay on the XLA kernel.

Semantics are identical to ops.affine_dp._align_batch for offset-0 problems:
the same traceback byte layout, the same F prefix-max formulation (computed
with a log2(width) doubling loop of static shifts).

Enable with PAV_TPU_PALLAS=1 (opt-in while unvalidated on real hardware; the
test suite runs it in interpreter mode).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG = -(1 << 29)  # plain int: pallas kernels cannot capture array constants


def _prefix_max_exclusive(x, width):
    """Exclusive running max along a [width] vector via log-step doubling."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (width, 1), 0).squeeze(-1)
    # Shift right by one (exclusive) with NEG fill.
    run = jnp.where(idx >= 1, jnp.roll(x, 1), NEG)
    shift = 1
    while shift < width:
        shifted = jnp.where(idx >= shift, jnp.roll(run, shift), NEG)
        run = jnp.maximum(run, shifted)
        shift <<= 1
    return run


def _dp_kernel(q_ref, r_ref, m_ref, n_ref, tb_ref,
               *, max_m, width, match, mismatch, o1, o2, e1, e2):
    ni = n_ref[0]
    mi = m_ref[0]
    j = jax.lax.broadcasted_iota(jnp.int32, (width, 1), 0).squeeze(-1)

    h0 = jnp.where(j == 0, 0,
                   -jnp.minimum(o1 + j * e1, o2 + j * e2)).astype(jnp.int32)
    h0 = jnp.where(j <= ni, h0, NEG)
    e0 = jnp.full((width,), NEG, dtype=jnp.int32)

    r_row = r_ref[0, :]  # [max_n] int8
    rb = jnp.where((j >= 1) & (j <= ni),
                   r_row[jnp.clip(j - 1, 0, r_row.shape[0] - 1)], jnp.int8(4))

    def row_step(i, carry):
        h_prev, e1_prev, e2_prev = carry
        valid = (j <= ni) & (i <= mi)

        e1_open = h_prev - (o1 + e1)
        e1_ext = e1_prev - e1
        e1_new = jnp.maximum(e1_open, e1_ext)
        bit_e1_ext = e1_ext > e1_open

        e2_open = h_prev - (o2 + e2)
        e2_ext = e2_prev - e2
        e2_new = jnp.maximum(e2_open, e2_ext)
        bit_e2_ext = e2_ext > e2_open

        e_best = jnp.maximum(e1_new, e2_new)
        bit_e_piece2 = e2_new > e1_new

        qb = q_ref[0, i - 1]
        subst = jnp.where((qb == rb) & (qb < 4) & (rb < 4), match, mismatch)
        h_diag = jnp.where(j >= 1, jnp.roll(h_prev, 1), NEG)
        diag = jnp.where(j >= 1, h_diag + subst, NEG)

        htilde = jnp.maximum(diag, e_best)
        bit_ht_e = e_best > diag

        def f_scan(ext, open_):
            aug = htilde + j * ext
            prev_max = _prefix_max_exclusive(aug, width)
            f = prev_max - open_ - j * ext
            aug_left = jnp.where(j >= 1, jnp.roll(aug, 1), NEG)
            opened_at_prev = (j == 0) | (prev_max == aug_left)
            return f, opened_at_prev

        f1, bit_f1_open = f_scan(e1, o1)
        f2, bit_f2_open = f_scan(e2, o2)
        f_best = jnp.maximum(f1, f2)
        bit_f_piece2 = f2 > f1

        h_new = jnp.maximum(htilde, f_best)
        bit_h_f = f_best > htilde

        h_new = jnp.where(valid, h_new, NEG)
        e1_new = jnp.where(valid, e1_new, NEG)
        e2_new = jnp.where(valid, e2_new, NEG)

        tb = (bit_ht_e.astype(jnp.uint8)
              | (bit_h_f.astype(jnp.uint8) << 1)
              | (bit_e_piece2.astype(jnp.uint8) << 2)
              | (bit_f_piece2.astype(jnp.uint8) << 3)
              | (bit_e1_ext.astype(jnp.uint8) << 4)
              | (bit_e2_ext.astype(jnp.uint8) << 5)
              | (bit_f1_open.astype(jnp.uint8) << 6)
              | (bit_f2_open.astype(jnp.uint8) << 7))
        tb_ref[0, i - 1, :] = tb

        return (h_new, e1_new, e2_new)

    jax.lax.fori_loop(1, max_m + 1, row_step, (h0, e0, e0))


@functools.partial(jax.jit, static_argnames=('max_m', 'width', 'match', 'mismatch',
                                             'o1', 'o2', 'e1', 'e2', 'interpret'))
def pallas_align_full(q, r, m, n, max_m, width, match, mismatch, o1, o2, e1, e2,
                      interpret=False):
    """Full-width DP traceback tensor via a Pallas grid over the batch.

    :return: (tb [B, max_m, width] uint8, offs [B, max_m] int32 zeros) —
        drop-in for _align_batch's outputs on offset-0 problems.
    """
    B = q.shape[0]
    kernel = functools.partial(
        _dp_kernel, max_m=max_m, width=width, match=match, mismatch=mismatch,
        o1=o1, o2=o2, e1=e1, e2=e2)

    tb = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, q.shape[1]), lambda b: (b, 0)),
            pl.BlockSpec((1, r.shape[1]), lambda b: (b, 0)),
            pl.BlockSpec((1,), lambda b: (b,)),
            pl.BlockSpec((1,), lambda b: (b,)),
        ],
        out_specs=pl.BlockSpec((1, max_m, width), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, max_m, width), jnp.uint8),
        interpret=interpret,
    )(q.reshape(B, -1), r.reshape(B, -1), m, n)

    offs = jnp.zeros((B, max_m), dtype=jnp.int32)
    return tb, offs
