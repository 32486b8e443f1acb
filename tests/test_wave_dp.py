"""Wavefront banded DP kernel parity (ops/affine_dp._align_batch_wave and
ops/pallas_dp.pallas_align_wave).

The wave kernels are the accelerator band path (XLA scan fallback + pallas
Mosaic production kernel). Both must produce bit-identical traceback tapes to
each other, and identical CIGARs to the row-banded kernel and the full-width
kernel whenever the path stays in band (tie-break semantics are shared — see
the traceback byte layout in ops/affine_dp.py).

Reference role: minimap2's banded extension stage (the native DP behind
rules/align.snakefile:206-214); the band-escape -> full-width retry mirrors
its -r bandwidth semantics.
"""

import numpy as np
import pytest

from pav_tpu.ops import affine_dp as A
from pav_tpu.ops import pallas_dp as P

SCORING = (1, -5, 5, 56, 4, 1)


def _mutate(r, rng):
    q = r.copy()
    for _ in range(int(rng.integers(0, 8))):
        p = int(rng.integers(0, max(len(q) - 1, 1)))
        op = rng.random()
        if op < 0.5:
            q[p] = (q[p] + 1 + rng.integers(0, 3)) % 4
        elif op < 0.75 and len(q) > 6:
            q = np.delete(q, slice(p, min(p + int(rng.integers(1, 6)), len(q))))
        else:
            q = np.insert(q, p, rng.integers(0, 4, int(rng.integers(1, 6))).astype(np.int8))
    return q


def _decode(buf, i):
    err = bool(buf[i, -1])
    pl_ = int(sum(int(buf[i, -5 + k]) << (8 * k) for k in range(4)))
    return err, A.packed_steps_to_cigar(buf[i, :-5], pl_)


def test_wave_matches_row_and_full_kernels():
    """xla-wave CIGARs == row-banded CIGARs == full-width CIGARs whenever
    neither band flags an escape (random related sequences, m <= n)."""
    rng = np.random.default_rng(5)
    n_cases = 0
    for trial in range(40):
        n_len = int(rng.integers(8, 400))
        r = rng.integers(0, 4, n_len).astype(np.int8)
        q = _mutate(r, rng)
        if len(q) > n_len:
            q, r = r, q
        m_len, n_len = len(q), len(r)
        max_m = ((m_len + 15) // 16) * 16
        max_n = ((n_len + 15) // 16) * 16
        width = min(2 * abs(m_len - n_len) + 33, max_n + 1)
        if width >= max_n + 1:
            continue
        B = 4
        qp = np.full((B, max_m), 4, np.int8)
        qp[0, :m_len] = q
        rp = np.full((B, max_n), 4, np.int8)
        rp[0, :n_len] = r
        qp[1:, 0] = 0
        rp[1:, 0] = 0
        m = np.array([m_len, 1, 1, 1], np.int32)
        n = np.array([n_len, 1, 1, 1], np.int32)
        args = (qp, rp, m, n, max_m, width) + SCORING
        bw = np.asarray(A._align_and_trace(*args, backend_kind='xla-wave'))
        br = np.asarray(A._align_and_trace(*args, backend_kind='xla'))
        bf = np.asarray(A._align_and_trace(
            qp, rp, m, n, max_m, max_n + 1, *SCORING, backend_kind='xla'))
        ew, cw = _decode(bw, 0)
        er, cr = _decode(br, 0)
        ef, cf = _decode(bf, 0)
        assert not ef
        if not ew and not er:
            assert np.array_equal(cw[0], cr[0]) and np.array_equal(cw[1], cr[1]), \
                f'wave != row at trial {trial} (m={m_len} n={n_len} w={width})'
        if not ew:
            assert np.array_equal(cw[0], cf[0]) and np.array_equal(cw[1], cf[1]), \
                f'wave != full at trial {trial} (m={m_len} n={n_len} w={width})'
            n_cases += 1
    assert n_cases >= 20   # the generator must actually exercise the band


def test_pallas_wave_interpret_bit_parity():
    """pallas wave (interpreter) produces the identical tape + offsets as the
    XLA wave kernel, including padded batch rows and ragged m/n."""
    rng = np.random.default_rng(7)
    for trial in range(6):
        max_m, max_n = 64, 128
        B = 8
        width = 65
        q = rng.integers(0, 5, (B, max_m)).astype(np.int8)
        r = rng.integers(0, 5, (B, max_n)).astype(np.int8)
        m = rng.integers(1, max_m + 1, B).astype(np.int32)
        n = rng.integers(1, max_n + 1, B).astype(np.int32)
        m2 = np.minimum(m, n)
        n2 = np.maximum(m, n)
        tb1, off1 = A._align_batch_wave(q, r, m2, n2, max_m, width, *SCORING)
        tb2, off2 = P.pallas_align_wave(q, r, m2, n2, max_m, width, *SCORING,
                                        interpret=True)
        assert np.array_equal(np.asarray(off1), np.asarray(off2))
        assert np.array_equal(np.asarray(tb1), np.asarray(tb2))
