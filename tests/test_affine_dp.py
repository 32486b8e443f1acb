"""Banded affine DP kernel vs. brute-force two-piece affine global alignment."""

import numpy as np
import pytest

from pav_tpu.align import cigar as cg
from pav_tpu.ops import affine_dp
from helpers import random_seq

SC = affine_dp.DEFAULT_SCORING


def brute_force_score(q, r, sc=SC):
    """Full-matrix two-piece affine global alignment score (numpy, exact)."""
    m, n = len(q), len(r)
    o1, o2 = sc['gap_open']
    e1, e2 = sc['gap_ext']
    NEG = -10**9

    H = np.full((m + 1, n + 1), NEG, dtype=np.int64)
    E1 = np.full((m + 1, n + 1), NEG, dtype=np.int64)
    E2 = np.full((m + 1, n + 1), NEG, dtype=np.int64)
    F1 = np.full((m + 1, n + 1), NEG, dtype=np.int64)
    F2 = np.full((m + 1, n + 1), NEG, dtype=np.int64)

    H[0, 0] = 0
    for j in range(1, n + 1):
        H[0, j] = -min(o1 + j * e1, o2 + j * e2)
    for i in range(1, m + 1):
        H[i, 0] = -min(o1 + i * e1, o2 + i * e2)

    for i in range(1, m + 1):
        for j in range(1, n + 1):
            E1[i, j] = max(H[i - 1, j] - o1 - e1, E1[i - 1, j] - e1)
            E2[i, j] = max(H[i - 1, j] - o2 - e2, E2[i - 1, j] - e2)
            F1[i, j] = max(H[i, j - 1] - o1 - e1, F1[i, j - 1] - e1)
            F2[i, j] = max(H[i, j - 1] - o2 - e2, F2[i, j - 1] - e2)
            s = sc['match'] if (q[i - 1] == r[j - 1] and q[i - 1] < 4) else sc['mismatch']
            H[i, j] = max(H[i - 1, j - 1] + s, E1[i, j], E2[i, j], F1[i, j], F2[i, j])
    return int(H[m, n])


def cigar_score(lens, ops, q, r, sc=SC):
    """Score a CIGAR path and verify it is a consistent path over (q, r)."""
    score = 0
    i = j = 0
    for l, op in zip(lens, ops):
        l = int(l)
        if op == cg.EQ:
            assert np.all(q[i:i + l] == r[j:j + l])
            score += sc['match'] * l
            i += l; j += l
        elif op == cg.X:
            assert np.all((q[i:i + l] != r[j:j + l]) | (q[i:i + l] >= 4))
            score += sc['mismatch'] * l
            i += l; j += l
        elif op == cg.I:
            score -= affine_dp.gap_cost(l, sc)
            i += l
        elif op == cg.D:
            score -= affine_dp.gap_cost(l, sc)
            j += l
        else:
            raise AssertionError(f'unexpected op {op}')
    assert i == len(q) and j == len(r)
    return int(score)


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_random_small_full_width(seed):
    rng = np.random.default_rng(seed)
    aligner = affine_dp.BandedAligner()
    pairs = []
    for _ in range(8):
        m = int(rng.integers(1, 40))
        q = random_seq(m, rng)
        # r = mutated q
        r = q.copy()
        if rng.random() < 0.7 and m > 4:
            p = int(rng.integers(0, m - 1))
            r = np.concatenate([r[:p], random_seq(int(rng.integers(1, 6)), rng), r[p:]])
        if rng.random() < 0.5:
            p = int(rng.integers(0, len(r)))
            r = np.delete(r, slice(p, p + int(rng.integers(1, 4))))
        if len(r) == 0:
            r = random_seq(3, rng)
        pairs.append((q, r))

    width = max(max(len(r) for _, r in pairs) + 1, max(len(q) for q, _ in pairs) + 1)
    results = aligner.align_batch(pairs, width=width)

    for (q, r), (lens, ops) in zip(pairs, results):
        got = cigar_score(lens, ops, q, r)
        want = brute_force_score(q, r)
        assert got == want, f'{got} != {want} for m={len(q)} n={len(r)}'


def test_identical_sequences():
    rng = np.random.default_rng(9)
    q = random_seq(100, rng)
    aligner = affine_dp.BandedAligner()
    (lens, ops), = aligner.align_batch([(q, q.copy())], width=128)
    assert cg.to_string(lens, ops) == '100='


def test_large_insertion_banded():
    rng = np.random.default_rng(10)
    r = random_seq(300, rng)
    ins = random_seq(120, rng)
    q = np.concatenate([r[:150], ins, r[150:]])  # q has 120bp insertion
    aligner = affine_dp.BandedAligner()
    width = 2 * abs(len(q) - len(r)) + 129
    (lens, ops), = aligner.align_batch([(q, r)], width=width)
    got = cigar_score(lens, ops, q, r)
    want = brute_force_score(q, r)
    assert got == want
    # Must contain a single 120bp I op
    assert any(int(l) == 120 and op == cg.I for l, op in zip(lens, ops))


def test_leading_deletion_banded():
    rng = np.random.default_rng(12)
    q = random_seq(200, rng)
    r = np.concatenate([random_seq(90, rng), q])  # deletion at the very start
    aligner = affine_dp.BandedAligner()
    width = 2 * 90 + 129
    (lens, ops), = aligner.align_batch([(q, r)], width=width)
    got = cigar_score(lens, ops, q, r)
    want = brute_force_score(q, r)
    assert got == want


def test_empty_sides():
    aligner = affine_dp.BandedAligner()
    rng = np.random.default_rng(13)
    q = random_seq(10, rng)
    (lens, ops), = aligner.align_batch([(q, np.zeros(0, dtype=np.uint8))], width=16)
    assert cg.to_string(lens, ops) == '10I'
    (lens, ops), = aligner.align_batch([(np.zeros(0, dtype=np.uint8), q)], width=16)
    assert cg.to_string(lens, ops) == '10D'


def test_band_escape_resolves_to_none_and_full_width_recovers():
    """A path with opposing gaps (net zero length change) escapes a narrow
    band: the item must resolve to None (not an exception), and a full-width
    re-run must produce a valid alignment. This is the aligner's per-item
    retry contract."""
    rng = np.random.default_rng(41)
    s1 = rng.integers(0, 4, 60).astype(np.uint8)
    s2 = rng.integers(0, 4, 60).astype(np.uint8)
    ins = rng.integers(0, 4, 40).astype(np.uint8)
    dele = rng.integers(0, 4, 40).astype(np.uint8)
    q = np.concatenate([s1, ins, s2])
    r = np.concatenate([s1, dele, s2])  # unrelated middle: I+D wander

    dp = affine_dp.BandedAligner()
    narrow = dp.align_batch([(q, r)], width=17, pad_to=(256, 256))
    full = dp.align_batch([(q, r)], width=161, pad_to=(256, 256))

    assert full[0] is not None
    lens, ops = full[0]
    assert int(lens[cg.CONSUMES_QRY[ops].astype(bool)].sum()) == len(q)
    assert int(lens[cg.CONSUMES_REF[ops].astype(bool)].sum()) == len(r)
    # The narrow run either found an in-band path or flagged the item; it must
    # never raise or return a malformed CIGAR.
    if narrow[0] is not None:
        lens_n, ops_n = narrow[0]
        assert int(lens_n[cg.CONSUMES_QRY[ops_n].astype(bool)].sum()) == len(q)


def test_accel_bucket_ladder():
    """Accelerator shape classes: coarse ladder, full width for small and
    unbalanced classes, banded window only for balanced large classes."""
    from pav_tpu.align.aligner.core import _accel_bucket, _ACCEL_LADDER

    # Small and unbalanced classes run at full width (exact DP, no retries).
    # Callers orient m <= n (transposed DP) before bucketing.
    assert _accel_bucket(10, 10) == (16, 16, 17)
    assert _accel_bucket(10, 100) == (16, 128, 129)
    assert _accel_bucket(40, 100) == (64, 128, 129)
    assert _accel_bucket(300, 400) == (512, 512, 513)
    assert _accel_bucket(100, 1900) == (128, 2048, 2049)
    # <= 2048 columns is always full width (the gather-free kernel).
    assert _accel_bucket(1000, 1010) == (1024, 1024, 1025)
    assert _accel_bucket(600, 1900) == (1024, 2048, 2049)
    # Balanced 8192 classes get a banded window when the segment hugs the
    # diagonal; the width value compiles at width+1 (pow2+1 rounding).
    assert _accel_bucket(5000, 5400) == (8192, 8192, 2048)
    assert _accel_bucket(3000, 3010) == (8192, 8192, 512)
    # Every primed accelerator shape is reachable from the bucketing rules.
    from pav_tpu.runtime import _DP_SHAPES_ACCEL
    for (m_b, n_b), _w in _DP_SHAPES_ACCEL:
        assert m_b in _ACCEL_LADDER and n_b in _ACCEL_LADDER


def test_accel_bucket_covers_primed_widths():
    """The width assigned by _accel_bucket for representative segment sizes is
    always one of the primed (shape, width) classes, so an accelerator run of
    human-like data never compiles an unprimed program."""
    from pav_tpu.align.aligner.core import _accel_bucket
    from pav_tpu.runtime import _DP_SHAPES_ACCEL

    primed = {(m_b, n_b, w) for (m_b, n_b), w in _DP_SHAPES_ACCEL}
    rng = np.random.default_rng(7)
    for _ in range(500):
        m = int(rng.integers(1, 8000))
        n = int(rng.integers(1, 8000))
        m, n = min(m, n), max(m, n)   # callers orient m <= n (transpose)
        m_b, n_b, w = _accel_bucket(m, n)
        if not ((m_b == n_b == 8192 and n - m > 992)
                or (m_b == 2048 and n_b == 8192)):
            assert (m_b, n_b, w) in primed, (m, n, m_b, n_b, w)


def test_coalesce_buckets():
    """Tiny full-width classes fold into CLOSE (<=4x padded-cell) wider
    neighbors only; bigger classes launch their own quantized batch instead
    (padded cells are not free: a wide fold was 90%+ of DP resolve time)."""
    from pav_tpu.align.aligner.core import _coalesce_buckets

    small = [(i, False) for i in range(10)]
    small2 = [(i, True) for i in range(20)]
    mid = [(i, True) for i in range(40)]
    # A tiny class folds into the nearest subsuming class within the 4x
    # per-item padded-cell bound; it does NOT cascade into far-wider classes.
    out = _coalesce_buckets({(64, 64, 65): list(small),
                             (64, 256, 257): list(small2),
                             (256, 2048, 2049): list(small)})
    assert set(out) == {(64, 256, 257), (256, 2048, 2049)}
    assert len(out[(64, 256, 257)]) == 30
    # A lone tiny class stays (no target to join).
    out = _coalesce_buckets({(64, 64, 65): list(small)})
    assert list(out) == [(64, 64, 65)]
    # A class at/above the item threshold is never merged away.
    out = _coalesce_buckets({(64, 64, 65): list(mid),
                             (64, 256, 257): list(mid)})
    assert (64, 64, 65) in out
    # Banded classes neither move nor receive.
    out = _coalesce_buckets({(8192, 8192, 512): list(small),
                             (64, 64, 65): list(small2)})
    assert set(out) == {(8192, 8192, 512), (64, 64, 65)}


def test_resident_gather_flags():
    """Device-resident gather: flag bit0 reverses the window, bit1 complements
    it, so reverse-complement windows never need their own upload (core.py
    rc_map; gather in affine_dp._align_and_trace_resident)."""
    import jax.numpy as jnp

    from pav_tpu import seqcodec

    rng = np.random.default_rng(5)
    dp = affine_dp.BandedAligner()
    src = rng.integers(0, 4, 512).astype(np.uint8)
    resident = jnp.asarray(np.concatenate(
        [src.astype(np.int8), np.full(512, 4, dtype=np.int8)]))

    off, ln = 37, 90
    fwd = src[off:off + ln]
    variants = {
        0: fwd,
        1: fwd[::-1],
        2: seqcodec.revcomp(fwd)[::-1],  # complement only
        3: seqcodec.revcomp(fwd),        # reverse+complement
    }
    r = np.delete(fwd, slice(10, 13))    # 3bp deletion vs the window
    r_off = 300
    resident = resident.at[r_off:r_off + len(r)].set(r.astype(np.int8))

    for flags, q_expect in variants.items():
        res = dp.align_batch_refs_async(
            [(off, ln, flags, r_off, len(r), 0)],
            width=129, pad_to=(128, 128), pad_batch=8, resident=resident)()
        lens, ops = res[0]
        exp = dp.align_batch([(q_expect, r)], width=129, pad_to=(128, 128))[0]
        assert np.array_equal(lens, exp[0]) and np.array_equal(ops, exp[1]), flags
