"""Native (C++) runtime components match their Python/numpy fallbacks exactly.

The native library is the primary path for host-side irregular work
(minimizer sketching, chain DP, chain extraction); these tests pin it
bit-for-bit to the reference fallbacks so either path is interchangeable.
"""

import numpy as np
import pytest

from pav_tpu import native

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason='native toolchain unavailable')


def _random_parent_forest(n, seed):
    """A parent forest shaped like chain-DP output: mostly short back links."""
    rng = np.random.default_rng(seed)
    parents = np.full(n, -1, dtype=np.int64)
    scores = np.full(n, 19.0, dtype=np.float32)
    for i in range(1, n):
        if rng.random() < 0.9:
            parents[i] = i - rng.integers(1, min(i, 40) + 1)
            scores[i] = scores[parents[i]] + rng.integers(1, 20)
    return scores, parents


def _py_extract(scores, parents, cand, min_chain_score, min_anchors):
    used = np.zeros(len(scores), dtype=bool)
    out = []
    for i in cand:
        i = int(i)
        if used[i]:
            continue
        path = []
        j = i
        while j >= 0 and not used[j]:
            path.append(j)
            used[j] = True
            j = int(parents[j])
        if len(path) < min_anchors:
            continue
        own = float(scores[i]) - (float(scores[j]) if j >= 0 else 0.0)
        if own < min_chain_score:
            continue
        path.reverse()
        out.append((path, own))
    return out


@pytest.mark.parametrize('seed', [3, 11])
def test_chain_extract_parity(seed):
    scores, parents = _random_parent_forest(50000, seed)
    cand = np.nonzero(scores >= 100)[0]
    cand = cand[np.argsort(-scores[cand], kind='stable')]

    res = native.chain_extract(scores, parents, cand, 100.0, 3)
    assert res is not None
    idx_all, starts, own = res
    expected = _py_extract(scores, parents, cand, 100.0, 3)

    assert len(expected) == len(own)
    for t, (path, s) in enumerate(expected):
        assert np.array_equal(idx_all[starts[t]:starts[t + 1]], np.array(path))
        assert abs(s - own[t]) < 1e-3


def test_chain_extract_empty():
    scores = np.array([19.0, 19.0], dtype=np.float32)
    parents = np.array([-1, -1], dtype=np.int64)
    cand = np.zeros(0, dtype=np.int64)
    idx_all, starts, own = native.chain_extract(scores, parents, cand, 100.0, 3)
    assert len(own) == 0 and len(idx_all) == 0 and starts[0] == 0


def test_minimizer_sketch_matches_numpy():
    from pav_tpu.align.aligner import index as idx_mod

    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, 20000).astype(np.uint8)
    codes[5000:5007] = 4  # ambiguity run: windows touching it never win

    n_pos, n_hash, n_strand = native.minimizer_sketch(codes, 19, 10)

    # Force the numpy fallback by monkeypatching the native entry.
    orig = native.minimizer_sketch
    try:
        native.minimizer_sketch = lambda *a, **k: None
        p_pos, p_hash, p_strand = idx_mod.minimizers(codes, 19, 10)
    finally:
        native.minimizer_sketch = orig

    assert np.array_equal(n_pos, p_pos)
    assert np.array_equal(n_hash, p_hash)
    assert np.array_equal(n_strand, p_strand)


def test_chain_dp_matches_scan():
    from pav_tpu.ops import chain_scan

    rng = np.random.default_rng(5)
    n = 3000
    qpos = np.sort(rng.integers(0, 100000, n)).astype(np.int64)
    rpos = (qpos + rng.integers(-30, 30, n)).astype(np.int64)
    group = np.zeros(n, dtype=np.int64)

    f_n, p_n = native.chain_dp(qpos, rpos, group, 19, 64, 50000.0, 10000.0, 0.05)
    # Force the jitted-scan fallback by hiding the native entry.
    orig = native.chain_dp
    try:
        native.chain_dp = lambda *a, **k: None
        f_j, p_j = chain_scan.chain_scores(
            qpos, rpos, group, 19, lookback=64, max_dist=50000,
            max_gap_diff=10000, gap_scale=0.05)
    finally:
        native.chain_dp = orig

    np.testing.assert_allclose(f_n, np.asarray(f_j), rtol=1e-5, atol=1e-3)
    # Parents may differ only where scores tie; require equal scores there.
    diff = np.asarray(p_j) != p_n
    assert np.allclose(f_n[diff], np.asarray(f_j)[diff], atol=1e-3)


def test_hash_index_lookup_parity():
    """Native probe-table lookup returns identical hits (order included) to
    the numpy searchsorted path."""
    import sys
    from pav_tpu.io.fasta import SeqStore
    from pav_tpu.align.aligner.index import MinimizerIndex, minimizers
    sys.path.insert(0, 'tests')
    from helpers import random_seq

    rng = np.random.default_rng(17)
    ref = SeqStore({'c1': random_seq(200000, rng), 'c2': random_seq(100000, rng)})
    idx = MinimizerIndex(ref, k=19, w=10)
    assert idx._hash_index is not None

    q = np.concatenate([ref.get('c1')[50000:90000], random_seq(5000, rng)])
    _, h, _ = minimizers(q, 19, 10)

    a = idx.lookup(h, max_occ=16)
    idx._hash_index = None
    b = idx.lookup(h, max_occ=16)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
    assert len(a[0]) > 1000


def test_fused_anchor_assembly_parity():
    """Native fused anchors (probe + strand transform + row assembly) match
    the numpy composition path."""
    import sys
    from pav_tpu.io.fasta import SeqStore
    from pav_tpu.align.aligner.index import MinimizerIndex
    from pav_tpu.align.aligner.chain import collect_anchors
    from pav_tpu import seqcodec
    sys.path.insert(0, 'tests')
    from helpers import random_seq

    rng = np.random.default_rng(23)
    ref = SeqStore({'c1': random_seq(150000, rng), 'c2': random_seq(80000, rng)})
    idx = MinimizerIndex(ref, k=19, w=10)
    assert idx._hash_index is not None
    # Mixed-orientation query: fwd slice + revcomp slice + noise
    q = np.concatenate([
        ref.get('c1')[20000:50000],
        seqcodec.revcomp(ref.get('c2')[10000:30000]),
        random_seq(3000, rng)])

    a = collect_anchors(q, idx, max_occ=16)
    idx._hash_index = None
    b = collect_anchors(q, idx, max_occ=16)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))
    assert len(a[0]) > 2000
    assert a[3].any() and not a[3].all()


def test_sort_anchors_parity():
    rng = np.random.default_rng(29)
    n = 100000
    qpos = rng.integers(0, 1 << 27, n)
    rpos = rng.integers(0, 1 << 27, n)
    chrom = rng.integers(0, 5, n).astype(np.int32)
    rev = rng.integers(0, 2, n).astype(np.uint8)

    res = native.sort_anchors(qpos, rpos, chrom, rev)
    assert res is not None
    sq, sr, sg, sc, sv = res

    group = chrom.astype(np.int64) * 2 + rev.astype(np.int64)
    order = np.lexsort((qpos, rpos, group))
    assert np.array_equal(sq, qpos[order])
    assert np.array_equal(sr, rpos[order])
    assert np.array_equal(sg, group[order])
    assert np.array_equal(sc, chrom[order])
    assert np.array_equal(sv, rev[order].astype(bool))

    # Chromosome-scale coordinates (beyond the old 2^28 packing) sort
    # natively now: bit widths adapt to the actual maxima.
    big_q = rng.integers(0, 1 << 28, n)
    big_r = rng.integers(0, 3_000_000_000, n)      # 3 Gbp scaffold
    res = native.sort_anchors(big_q, big_r, chrom, rev)
    assert res is not None
    bq, br_, bg, bc, bv = res
    order = np.lexsort((big_q, big_r, group))
    assert np.array_equal(bq, big_q[order])
    assert np.array_equal(br_, big_r[order])

    # Combined widths beyond 64 bits must fall back (return None).
    huge = big_q.copy()
    huge[0] = 1 << 40
    assert native.sort_anchors(huge, big_r, chrom, rev) is None


@pytest.mark.parametrize('seed', [3, 11])
def test_chain_select_extract_parity(seed):
    """Fused selection+sort+extraction matches the two-step path exactly."""
    scores, parents = _random_parent_forest(50000, seed)
    cand = np.nonzero(scores >= 100)[0]
    cand = cand[np.argsort(-scores[cand], kind='stable')]

    a = native.chain_select_extract(scores, parents, 100.0, 3)
    b = native.chain_extract(scores, parents, cand, 100.0, 3)
    assert a is not None and b is not None
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_sort_anchors_parallel_path_parity():
    """The chunk-parallel radix path activates at n >= 8M anchors; pin its
    stable-order parity against numpy lexsort (small-n tests only exercise
    the single-threaded path)."""
    rng = np.random.default_rng(9)
    n = (8 << 20) + 12345
    qpos = rng.integers(0, 1 << 26, n).astype(np.int32)
    rpos = rng.integers(0, 1 << 26, n).astype(np.int32)
    chrom = rng.integers(0, 6, n).astype(np.int32)
    rev = rng.integers(0, 2, n).astype(np.uint8)
    res = native.sort_anchors(qpos, rpos, chrom, rev)
    assert res is not None
    sq, sr, sg, sc, sv = res
    group = chrom.astype(np.int64) * 2 + rev
    order = np.lexsort((qpos, rpos, group))
    assert np.array_equal(sq, qpos[order])
    assert np.array_equal(sr, rpos[order])
    assert np.array_equal(sg, group[order])
    assert np.array_equal(sc, chrom[order])
    assert np.array_equal(sv, rev[order].astype(bool))


def test_chain_dp_unbounded_limits():
    """max_dist/max_gap_diff >= 2^31 (or inf) must mean "no limit", not wrap
    to INT32_MIN in the native int32 comparison (advisor finding r4)."""
    rng = np.random.default_rng(11)
    n = 500
    qpos = np.sort(rng.integers(0, 100000, n)).astype(np.int64)
    rpos = (qpos + rng.integers(-30, 30, n)).astype(np.int64)
    group = np.zeros(n, dtype=np.int64)

    f_ref, _ = native.chain_dp(qpos, rpos, group, 19, 64,
                               1e9, 1e9, 0.05)
    for big in (float(1 << 33), float('inf')):
        f_big, _ = native.chain_dp(qpos, rpos, group, 19, 64,
                                   big, big, 0.05)
        np.testing.assert_allclose(f_big, f_ref, rtol=1e-5, atol=1e-3)
    assert f_ref.max() > 19.0  # chaining actually linked anchors
