"""Repeat-rich genome stress: aligner/caller behavior on tandem arrays,
segmental + inverted duplications, N-gaps, and low-complexity runs
(VERDICT r1 item 7; reference stressors: pavlib/inv.py:457-561,
scripts/density.py:47), plus MAPQ distribution pinning (weak #7).
"""

import numpy as np
import pandas as pd
import pytest

from pav_tpu import seqcodec
from pav_tpu.align.aligner import Aligner
from pav_tpu.io.fasta import SeqStore
from pav_tpu.pipeline import Pipeline

from helpers import Mutator, random_seq, repeat_rich_ref


@pytest.fixture(scope='module')
def repeat_run():
    rng = np.random.default_rng(13)
    ref, ann = repeat_rich_ref(3_000_000, rng)

    # Plant truth only in unique background (>=500bp clear of any feature):
    # recall there must not be degraded by the surrounding repeat structure.
    covered = np.zeros(len(ref), dtype=bool)
    for _, p, e in ann:
        covered[max(p - 500, 0):e + 500] = True

    mut = Mutator(ref)
    truth_unique = []
    pos = 50000
    rng2 = np.random.default_rng(99)
    while pos < len(ref) - 50000:
        if not covered[pos:pos + 1200].any():
            r = rng2.random()
            if r < 0.6:
                mut.snv(pos, rng=rng2)
            elif r < 0.85:
                ln = int(rng2.integers(1, 30))
                if rng2.random() < 0.5:
                    mut.ins(pos, random_seq(ln, rng2))
                else:
                    mut.dele(pos, ln)
            else:
                ln = int(rng2.integers(60, 900))
                if rng2.random() < 0.5:
                    mut.ins(pos, random_seq(ln, rng2))
                else:
                    mut.dele(pos, ln)
            truth_unique.append(mut.truth[-1])
        pos += 2500
    hap = mut.finish()
    assert len(truth_unique) > 100

    pipe = Pipeline(SeqStore({'chr1': ref}), {'aligner_min_chain_score': 1000})
    result = pipe.run_sample('rep', {'h1': SeqStore({'tig1': hap})},
                             write_vcf=False)
    return ref, ann, truth_unique, result


def test_repeat_rich_no_crash_and_coverage(repeat_run):
    """The engine survives a 3 Mbp repeat-rich genome and aligns the bulk of
    the contig (no band escapes / chain collapses over the repeat families)."""
    ref, ann, truth, result = repeat_run
    res = result['haps']['h1']
    assert res.align_qryref.shape[0] >= 1
    aligned_bp = int((res.align_qryref['END'] - res.align_qryref['POS']).sum())
    assert aligned_bp > 0.9 * len(ref)


def test_repeat_rich_unique_region_recall(repeat_run):
    """Variants planted in unique background are recovered despite the
    surrounding repeat structure (>=95% recall)."""
    ref, ann, truth, result = repeat_run
    merged = result['merged']
    called_snv = set(merged[('snv_snv', 'pass')]['POS'])
    called_insdel = set()
    for key in (('svindel_ins', 'pass'), ('svindel_del', 'pass')):
        called_insdel.update(merged[key]['POS'])

    missed = []
    for t in truth:
        if t['type'] == 'SNV':
            ok = t['pos'] in called_snv
        else:
            # Left-shift can move breakpoints; accept within 50bp.
            ok = any(abs(p - t['pos']) <= 50 for p in called_insdel)
        if not ok:
            missed.append(t)
    recall = 1 - len(missed) / len(truth)
    assert recall >= 0.95, f'recall {recall:.3f}; missed {missed[:5]}'


def test_repeat_rich_precision_sane(repeat_run):
    """Call counts stay near truth (repeats must not spray false positives):
    PASS SNVs <= 3x planted SNVs outside repeat regions."""
    ref, ann, truth, result = repeat_run
    n_truth_snv = sum(1 for t in truth if t['type'] == 'SNV')
    n_called = result['merged'][('snv_snv', 'pass')].shape[0]
    # Diverged segdup copies legitimately align with mismatches; allow
    # headroom but catch pathological explosion.
    assert n_called <= 3 * n_truth_snv + 200, (n_called, n_truth_snv)


def test_n_gap_table_covers_planted_gaps(repeat_run):
    """The engine's N-gap scan finds every planted gap run (parity with the
    reference's N-gap BED, rules/data.snakefile:40-71, which feeds the INV
    scanner's gap-abort; the reference does NOT suppress calls in gaps)."""
    ref, ann, truth, result = repeat_run
    gaps = [(p, e) for k, p, e in ann if k == 'n_gap']
    assert gaps
    table = SeqStore({'chr1': ref}).n_gap_table()
    starts = table['POS'].to_numpy()
    ends = table['END'].to_numpy()
    for p, e in gaps:
        assert ((starts <= p) & (ends >= e)).any(), f'gap {p}-{e} not indexed'


# ------------------------------------------------------------------- MAPQ


def test_mapq_distribution():
    """MAPQ pins to the second-best chain ratio: unique placement -> 60,
    exact two-copy duplication -> ~0, diverged copy -> intermediate
    (gates lgSV rescue at mapq>=40: largesv DIST_PROP_LEN_MAPQ)."""
    rng = np.random.default_rng(21)
    A = random_seq(40000, rng)
    C = random_seq(40000, rng)
    spacer = random_seq(8000, rng)

    # Exact duplicate of A; diverged (3%) duplicate of C.
    C_div = C.copy()
    idx = rng.choice(len(C), int(0.03 * len(C)), replace=False)
    C_div[idx] = (C_div[idx] + 1 + rng.integers(0, 3, len(idx))) % 4
    U = random_seq(40000, rng)

    ref = np.concatenate([A, spacer, A, spacer, C, spacer, C_div, spacer, U])
    aligner = Aligner(SeqStore({'chr1': ref}), {'aligner_min_chain_score': 1000})

    def mapq_of(codes, name):
        df = aligner.align_store(SeqStore({name: codes}), 'h1')
        assert df.shape[0] >= 1, name
        main = df.loc[(df['END'] - df['POS']).idxmax()]
        return int(main['MAPQ'])

    # Unique contig: unambiguous, full confidence.
    q_unique = mapq_of(U[5000:25000].copy(), 'uniq')
    assert q_unique == 60

    # Contig from the exact duplicate: two equal-score placements -> MAPQ ~0.
    q_dup = mapq_of(A[5000:25000].copy(), 'dup')
    assert q_dup <= 3, q_dup

    # Contig from the diverged copy: second-best exists but scores lower.
    q_div = mapq_of(C[5000:25000].copy(), 'div')
    assert q_dup < q_div, (q_dup, q_div)
