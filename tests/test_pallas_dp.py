"""Pallas full-width DP kernel: bit-identical to the XLA kernel, and the
end-to-end path produces identical CIGARs with PAV_TPU_PALLAS=1 (interpreter
mode on the CPU backend)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pav_tpu.align import cigar as cg
from pav_tpu.ops import affine_dp, pallas_dp

from helpers import random_seq


def _batch(rng, B=6, max_m=32):
    q = np.full((B, max_m), 4, np.int8)
    r = np.full((B, max_m), 4, np.int8)
    m = np.zeros(B, np.int32)
    n = np.zeros(B, np.int32)
    for i in range(B):
        mm = int(rng.integers(4, max_m))
        qq = random_seq(mm, rng)
        rr = qq.copy()
        if mm > 10 and rng.random() < 0.7:
            rr = np.delete(rr, slice(2, 5))
        if rng.random() < 0.4 and mm > 6:
            rr[3] = (rr[3] + 1) % 4
        q[i, :len(qq)] = qq
        r[i, :len(rr)] = rr
        m[i] = len(qq)
        n[i] = len(rr)
    return q, r, m, n


def test_pallas_tb_identical_to_xla():
    sc = affine_dp.DEFAULT_SCORING
    rng = np.random.default_rng(23)
    max_m = 32
    q, r, m, n = _batch(rng, max_m=max_m)
    args = (jnp.asarray(q), jnp.asarray(r), jnp.asarray(m), jnp.asarray(n),
            max_m, max_m + 1,
            sc['match'], sc['mismatch'], sc['gap_open'][0], sc['gap_open'][1],
            sc['gap_ext'][0], sc['gap_ext'][1])
    _, tb_ref, _ = affine_dp._align_batch(*args)
    tb_p, offs_p = pallas_dp.pallas_align_full(*args, interpret=True)
    assert np.array_equal(np.asarray(tb_ref), np.asarray(tb_p))
    assert (np.asarray(offs_p) == 0).all()


def test_pallas_end_to_end_cigars(monkeypatch):
    rng = np.random.default_rng(29)
    pairs = []
    for _ in range(10):
        mm = int(rng.integers(6, 60))
        qq = random_seq(mm, rng)
        rr = qq.copy()
        if mm > 15:
            rr = np.delete(rr, slice(4, 9))
        pairs.append((qq, rr))

    dp = affine_dp.BandedAligner()
    baseline = [cg.to_string(*res) for res in dp.align_batch(pairs, width=65, pad_to=64)]

    monkeypatch.setenv('PAV_TPU_PALLAS', '1')
    with_pallas = [cg.to_string(*res) for res in dp.align_batch(pairs, width=65, pad_to=64)]
    assert with_pallas == baseline
