"""Alignment trimming and liftover."""

import numpy as np
import pandas as pd
import pytest

from pav_tpu import seqcodec
from pav_tpu.align import cigar as cg
from pav_tpu.align.aligner import Aligner
from pav_tpu.align.lift import AlignLift
from pav_tpu.align.table import check_table, finalize_align_table
from pav_tpu.align.trim import trim_alignments, cut_candidates
from pav_tpu.io.fasta import SeqStore
from pav_tpu.regions import Region

from helpers import random_seq


def _repeat_deletion_case(seed=31):
    """ref = A + R + B + R + C ; contig = A + R + C (deletes B + second R).

    The repeat R maps the contig's single R copy to both reference copies,
    producing query-space-overlapping alignment records that trimming must
    resolve (the reference's canonical trimming scenario: trim.py:357-377).
    """
    rng = np.random.default_rng(seed)
    A = random_seq(20000, rng)
    R = random_seq(3000, rng)
    B = random_seq(15000, rng)
    C = random_seq(20000, rng)
    ref = np.concatenate([A, R, B, R, C])
    contig = np.concatenate([A, R, C])
    return ref, contig


def test_trim_resolves_repeat_overlap():
    ref, contig = _repeat_deletion_case()
    ref_store = SeqStore({'chr1': ref})
    qry_store = SeqStore({'tig1': contig})
    aligner = Aligner(ref_store, {'aligner_min_chain_score': 500})
    df = aligner.align_store(qry_store, 'h1')
    df = finalize_align_table(df)
    assert df.shape[0] >= 2

    df_trim = trim_alignments(df, 1000, qry_store.fai(), mode='tig')
    check_table(df_trim, qry_store.fai())

    # No remaining query-space overlaps between records of the same contig.
    sub = df_trim.sort_values('QRY_POS')
    ends = sub['QRY_END'].to_numpy()
    starts = sub['QRY_POS'].to_numpy()
    assert (starts[1:] >= ends[:-1]).all(), 'query overlap not resolved'

    # Trim accounting recorded.
    assert (df_trim[['TRIM_QRY_L', 'TRIM_QRY_R']].to_numpy().sum() > 0)

    # Reference-space pass keeps invariants too.
    df_trim2 = trim_alignments(df, 1000, qry_store.fai(), mode='both')
    check_table(df_trim2, qry_store.fai())
    sub2 = df_trim2.loc[df_trim2['QRY_ID'] == 'tig1'].sort_values('POS')
    rs = sub2['POS'].to_numpy()
    re_ = sub2['END'].to_numpy()
    assert (rs[1:] >= re_[:-1]).all(), 'reference overlap not resolved'


def test_trim_drops_contained():
    # A record fully contained in another (query space) must be removed.
    base = {
        '#CHROM': 'c', 'RG': 'NA', 'AO': 'NA', 'MAPQ': 60, 'REV': False,
        'FLAGS': '0x0000', 'HAP': 'h1',
        'TRIM_REF_L': 0, 'TRIM_REF_R': 0, 'TRIM_QRY_L': 0, 'TRIM_QRY_R': 0,
    }
    rows = [
        dict(base, POS=0, END=10000, INDEX=0, QRY_ID='q', QRY_POS=0,
             QRY_END=10000, QRY_LEN=12000, CIGAR='10000=2000H'),
        dict(base, POS=20000, END=24000, INDEX=1, QRY_ID='q', QRY_POS=2000,
             QRY_END=6000, QRY_LEN=12000, CIGAR='2000H4000=6000H'),
    ]
    df = pd.DataFrame(rows)
    out = trim_alignments(df, 1000, {'q': 12000}, mode='tig')
    assert out.shape[0] == 1
    assert out.iloc[0]['INDEX'] == 0


def test_cut_candidates():
    lens, ops = cg.parse('100=10X5I20=3D50=')
    cand = cut_candidates(lens, ops, 110, True)
    # Candidates cover only =/X runs, until cumulative cut > budget ending on '='.
    assert cand.spent[0] == 0                   # cut bases before first run
    assert cand.spent[1] == 100                 # after 100=
    assert not cand.mism[-1]                    # walk ends on a '=' run


def _lift_table():
    # Record: POS=1000, CIGAR 100=10I50=20D30=, contig len 300, fwd, plus
    # a reverse record on another contig.
    rows = [{
        '#CHROM': 'c', 'POS': 1000, 'END': 1200, 'INDEX': 0, 'QRY_ID': 'q1',
        'QRY_POS': 10, 'QRY_END': 200, 'QRY_LEN': 300, 'RG': 'NA', 'AO': 'NA',
        'MAPQ': 60, 'REV': False, 'FLAGS': '0x0000', 'HAP': 'h1',
        'CIGAR': '10H100=10I50=20D30=100H',
    }, {
        '#CHROM': 'c', 'POS': 5000, 'END': 5100, 'INDEX': 1, 'QRY_ID': 'q2',
        'QRY_POS': 50, 'QRY_END': 150, 'QRY_LEN': 200, 'RG': 'NA', 'AO': 'NA',
        'MAPQ': 60, 'REV': True, 'FLAGS': '0x0010', 'HAP': 'h1',
        'CIGAR': '50H100=50H',
    }]
    df = pd.DataFrame(rows)
    df.index = [0, 1]
    return df


def test_lift_points_fwd():
    df = _lift_table()
    lift = AlignLift(df, {'q1': 300, 'q2': 200})

    # ref 1000 -> qry 10 (first aligned base)
    assert lift.lift_to_qry('c', 1000)[:2] == ('q1', 10)
    # ref 1050 -> qry 60
    assert lift.lift_to_qry('c', 1050)[:2] == ('q1', 60)
    # within the 50= after the I: ref 1100+j -> qry 120+j
    assert lift.lift_to_qry('c', 1110)[:2] == ('q1', 130)
    # inside D (ref 1150..1170): maps to query point 171
    assert lift.lift_to_qry('c', 1160)[:2] == ('q1', 171)
    # qry -> ref inverse
    assert lift.lift_to_sub('q1', 60)[:2] == ('c', 1050)
    # inside the insertion (qry 110..120): maps to ref point 1101
    assert lift.lift_to_sub('q1', 115)[:2] == ('c', 1101)
    # outside any record
    assert lift.lift_to_qry('c', 999) is None
    assert lift.lift_to_sub('q1', 250) is None


def test_lift_points_rev():
    df = _lift_table()
    lift = AlignLift(df, {'q1': 300, 'q2': 200})
    # Reverse record: aligned-frame position 50..150 maps to ref 5000..5100;
    # original-frame qry pos p -> aligned pos 200-p.
    res = lift.lift_to_qry('c', 5000)
    assert res[0] == 'q2' and res[2] is True
    # ref 5000 -> aligned 50 -> original 200-50=150
    assert res[1] == 150
    # Original-frame QRY_END is exclusive: not contained -> None (reference
    # tree semantics, lift.py:89-99).
    assert lift.lift_to_sub('q2', 150) is None
    # Original first contained base (50) maps through the rev transform to the
    # aligned block end -> ref 5100 (reference end-landing rule, lift.py:122-128).
    res2 = lift.lift_to_sub('q2', 50)
    assert res2[:2] == ('c', 5100)
    # One base in: original 149 -> aligned 51 -> ref 5001.
    assert lift.lift_to_sub('q2', 149)[:2] == ('c', 5001)


def test_lift_region_roundtrip():
    df = _lift_table()
    lift = AlignLift(df, {'q1': 300, 'q2': 200})
    rgn = Region('c', 1010, 1090)
    qrgn = lift.lift_region_to_qry(rgn)
    assert qrgn is not None and (qrgn.pos, qrgn.end) == (20, 100)
    back = lift.lift_region_to_sub(qrgn)
    assert back is not None and (back.pos, back.end) == (1010, 1090)


def test_lift_gap_interpolation():
    # Two records on the same contig with a query gap between them.
    rows = [{
        '#CHROM': 'c', 'POS': 1000, 'END': 1100, 'INDEX': 0, 'QRY_ID': 'q',
        'QRY_POS': 0, 'QRY_END': 100, 'QRY_LEN': 300, 'RG': 'NA', 'AO': 'NA',
        'MAPQ': 60, 'REV': False, 'FLAGS': '0x0000', 'HAP': 'h1',
        'CIGAR': '100=200H',
    }, {
        '#CHROM': 'c', 'POS': 2000, 'END': 2100, 'INDEX': 1, 'QRY_ID': 'q',
        'QRY_POS': 200, 'QRY_END': 300, 'QRY_LEN': 300, 'RG': 'NA', 'AO': 'NA',
        'MAPQ': 60, 'REV': False, 'FLAGS': '0x0000', 'HAP': 'h1',
        'CIGAR': '200H100=',
    }]
    df = pd.DataFrame(rows)
    lift = AlignLift(df, {'q': 300})
    assert lift.lift_to_sub('q', 150) is None
    res = lift.lift_to_sub('q', 150, gap=True)
    assert res is not None
    chrom, pos, rev, lo, hi, idx = res
    assert chrom == 'c' and lo == 1100 and hi == 2000 and pos == (1100 + 2000) // 2
    assert idx == (0, 1)

    # strict_parity reproduces the reference verbatim (lift.py:350-378):
    # interpolated position and min/max bounds in QUERY coordinates.
    strict = AlignLift(df, {'q': 300}, strict_parity=True)
    res_s = strict.lift_to_sub('q', 150, gap=True)
    chrom, pos, rev, lo, hi, idx = res_s
    assert chrom == 'c' and pos == (100 + 200) // 2 and lo == 100 and hi == 200
    # Strict mode uses the reference's strict < on the left flank: a position
    # exactly at a record's exclusive end does not interpolate.
    assert strict.lift_to_sub('q', 100, gap=True) is None
    assert lift.lift_to_sub('q', 100, gap=True) is not None
