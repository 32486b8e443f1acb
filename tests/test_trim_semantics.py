"""Trimming semantics against hand-computed reference behavior."""

import numpy as np
import pandas as pd
import pytest

from pav_tpu.align import cigar as cg
from pav_tpu.align.trim import (cut_candidates, select_cut_pair,
                                trim_record_pair)


def _rec(chrom, pos, end, qry_pos, qry_end, qry_len, cigar, rev=False, index=0):
    lens, ops = cg.parse(cigar)
    return {
        '#CHROM': chrom, 'POS': pos, 'END': end, 'INDEX': index,
        'QRY_ID': 'q', 'QRY_POS': qry_pos, 'QRY_END': qry_end,
        'QRY_LEN': qry_len, 'RG': 'NA', 'AO': 'NA', 'MAPQ': 60,
        'REV': rev, 'FLAGS': '0x0000', 'HAP': 'h1', 'cig': (lens, ops),
        'TRIM_REF_L': 0, 'TRIM_REF_R': 0, 'TRIM_QRY_L': 0, 'TRIM_QRY_R': 0,
    }


def _cigar_of(rec):
    return cg.to_string(*rec['cig'])


def test_candidates_prefer_match_boundaries():
    lens, ops = cg.parse('50=10X40=')
    cand = cut_candidates(lens, ops, 20, True)
    # Walk stops after consuming past 20 query bases ending at a '=' op.
    assert cand.run_i[0] == 0
    assert list(cand.mism) == [False, True, False][:cand.size]


def test_cut_pair_maximizes_events():
    # The left record's trimmed end carries a 5X run 10 bases in: the optimal
    # 40-base cut must consume it (event-maximizing cut).
    lens_l, ops_l = cg.parse('85=5X10=')   # reversed below for right-end trim
    lens_r, ops_r = cg.parse('100=')
    cand_l = cut_candidates(lens_l[::-1], ops_l[::-1], 40, True)
    cand_r = cut_candidates(lens_r, ops_r, 40, True)
    li, ri = select_cut_pair(cand_l, cand_r, 40)
    assert li is not None and ri is not None
    # Cutting at the chosen left site removes the whole X run.
    assert cand_l.ev_lo[li] == 5


def test_trim_pair_query_space_accounting():
    # Two records overlapping by 100 bp in query space.
    # rec A: query [0, 600), ref 1000-1600; rec B: query [500, 1100), ref 5000-5600.
    rec_a = _rec('c', 1000, 1600, 0, 600, 1100, '600=500H', index=0)
    rec_b = _rec('c', 5000, 5600, 500, 1100, 1100, '500H600=', index=1)

    mod_a, mod_b = trim_record_pair(rec_a, rec_b, True,
                                    back_l=True, back_r=False)
    # Overlap fully resolved: query spans no longer overlap.
    assert mod_a['QRY_END'] <= mod_b['QRY_POS']
    # Total removed query bases equals the overlap.
    removed = (rec_a['QRY_END'] - mod_a['QRY_END']) + (mod_b['QRY_POS'] - rec_b['QRY_POS'])
    assert removed == 100
    # TRIM accounting matches the removal sides.
    assert mod_a['TRIM_QRY_R'] == rec_a['QRY_END'] - mod_a['QRY_END']
    assert mod_b['TRIM_QRY_L'] == mod_b['QRY_POS'] - rec_b['QRY_POS']
    # Reference spans shrink by the same amounts (pure '=' records).
    assert mod_a['END'] == 1600 - mod_a['TRIM_QRY_R']
    assert mod_b['POS'] == 5000 + mod_b['TRIM_QRY_L']
    # CIGARs remain valid and consistent.
    for rec in (mod_a, mod_b):
        lens, ops = rec['cig']
        ref_bp, qry_bp, *_ = cg.count(lens, ops)
        assert rec['POS'] + ref_bp == rec['END']
        assert rec['QRY_POS'] + qry_bp == rec['QRY_END']


def test_trim_pair_prefers_removing_events():
    # Record A ends with mismatches inside the overlap; the optimal cut removes
    # them from A rather than cutting matched bases from B.
    rec_a = _rec('c', 1000, 1600, 0, 600, 1200, '560=40X600H', index=0)
    rec_b = _rec('c', 5000, 5600, 560, 1160, 1200, '560H600=40H', index=1)
    mod_a, mod_b = trim_record_pair(rec_a, rec_b, True,
                                    back_l=True, back_r=False)
    # Overlap is 40; removing A's 40X maximizes events.
    assert mod_a['TRIM_QRY_R'] >= 39  # the X run went away (cut keeps >=1 base)
    lens, ops = mod_a['cig']
    assert int(lens[ops == cg.X].sum()) <= 1


def test_trim_pair_subject_space():
    # Reference-space overlap of 50 between same-contig records.
    rec_a = _rec('c', 1000, 1600, 0, 600, 1300, '600=700H', index=0)
    rec_b = _rec('c', 1550, 2150, 650, 1250, 1300, '650H600=50H', index=1)
    mod_a, mod_b = trim_record_pair(rec_a, rec_b, False)
    assert mod_a['END'] <= mod_b['POS']
    removed = (rec_a['END'] - mod_a['END']) + (mod_b['POS'] - rec_b['POS'])
    assert removed == 50
