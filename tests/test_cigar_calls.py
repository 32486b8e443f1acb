"""CIGAR caller and homology kernels, validated against naive reference-semantics
implementations and planted-truth synthetic data."""

import numpy as np
import pandas as pd
import pytest

from pav_tpu import seqcodec
from pav_tpu.align import cigar as cg
from pav_tpu.call import homology as hom
from pav_tpu.call.cigar_calls import make_insdel_snv_calls
from pav_tpu.call.variant_id import version_id
from pav_tpu.io.fasta import SeqStore

from helpers import Mutator, random_seq


def naive_left_homology(pos, seq, sv):
    """Direct transcription of the reference scalar walker (pavlib/call.py:542-592)."""
    if len(sv) == 0:
        return 0
    svlen = len(sv)
    h = 0
    while h <= pos:
        b = seq[pos - h]
        if b >= 4:
            break
        if sv[-((h + 1) % svlen)] != b:
            break
        h += 1
    return h


def naive_right_homology(pos, seq, sv):
    if len(sv) == 0:
        return 0
    svlen, n = len(sv), len(seq)
    h = 0
    while h < n - pos:
        b = seq[pos + h]
        if b >= 4:
            break
        if sv[h % svlen] != b:
            break
        h += 1
    return h


def test_homology_matches_naive():
    rng = np.random.default_rng(11)
    seq = random_seq(2000, rng)
    # Plant a tandem repeat to force long circular homology
    unit = random_seq(7, rng)
    seq[1000:1070] = np.tile(unit, 10)
    seq[1500] = 4  # ambiguous base stops search

    cases = []
    for _ in range(200):
        pos = int(rng.integers(0, 2000))
        svlen = int(rng.integers(1, 15))
        if rng.random() < 0.3:
            sv = np.tile(unit, 3)[:svlen]  # repeat-matched SV
        else:
            sv = random_seq(svlen, rng)
        cases.append((pos, sv))

    arena, offs, lens = hom.make_arena([sv for _, sv in cases])
    pos_arr = np.array([p for p, _ in cases])

    left = hom.left_homology_batch(pos_arr, seq, arena, offs, lens)
    right = hom.right_homology_batch(pos_arr, seq, arena, offs, lens)

    for i, (pos, sv) in enumerate(cases):
        assert left[i] == naive_left_homology(pos, seq, sv), f'left case {i}'
        assert right[i] == naive_right_homology(pos, seq, sv), f'right case {i}'


def truth_to_cigar(ref_len, truth):
    """Build the ideal =/X/I/D CIGAR from planted truth records."""
    ops = []
    cursor = 0
    for ev in truth:
        if ev['pos'] > cursor:
            ops.append((ev['pos'] - cursor, '='))
        if ev['type'] == 'SNV':
            ops.append((1, 'X'))
            cursor = ev['pos'] + 1
        elif ev['type'] == 'INS':
            ops.append((ev['len'], 'I'))
            cursor = ev['pos']
        elif ev['type'] == 'DEL':
            ops.append((ev['len'], 'D'))
            cursor = ev['pos'] + ev['len']
        else:
            raise ValueError(ev['type'])
    if ref_len > cursor:
        ops.append((ref_len - cursor, '='))
    return ''.join(f'{l}{o}' for l, o in ops)


def _align_row(chrom, qry, cigar_str, qry_len, pos=0, rev=False, index=0):
    lens, ops = cg.parse(cigar_str)
    ref_bp, qry_bp, hl, *_ = cg.count(lens, ops)
    return pd.Series({
        '#CHROM': chrom, 'POS': pos, 'END': pos + ref_bp,
        'INDEX': index, 'QRY_ID': qry,
        'QRY_POS': (qry_len - hl - qry_bp) if rev else hl,
        'QRY_END': (qry_len - hl) if rev else hl + qry_bp,
        'QRY_LEN': qry_len, 'RG': 'NA', 'AO': 'NA', 'MAPQ': 60,
        'REV': rev, 'FLAGS': '0x0010' if rev else '0x0000',
        'HAP': 'h1', 'CIGAR': cigar_str,
    })


def test_cigar_calls_recover_truth():
    rng = np.random.default_rng(5)
    ref = random_seq(30000, rng)
    mut = Mutator(ref)
    mut.snv(1000, rng=rng)
    mut.ins(2000, random_seq(10, rng))
    mut.dele(3000, 15)
    mut.ins(5000, random_seq(200, rng))
    mut.dele(8000, 300)
    mut.snv(9000, rng=rng)
    contig = mut.finish()

    cigar_str = truth_to_cigar(len(ref), mut.truth)

    ref_store = SeqStore({'chr1': ref})
    qry_store = SeqStore({'tig1': contig})
    df_align = pd.DataFrame([_align_row('chr1', 'tig1', cigar_str, len(contig))])

    df_snv, df_insdel = make_insdel_snv_calls(df_align, ref_store, qry_store, 'h1')

    # SNVs recovered at exact positions with right alleles
    truth_snv = [t for t in mut.truth if t['type'] == 'SNV']
    assert df_snv.shape[0] == len(truth_snv)
    for t in truth_snv:
        m = df_snv.loc[df_snv['POS'] == t['pos']]
        assert m.shape[0] == 1
        assert m.iloc[0]['REF'] == t['ref'] and m.iloc[0]['ALT'] == t['alt']

    # INS/DEL recovered; INS may be left-shifted, DEL coordinates are unshifted
    truth_ins = [t for t in mut.truth if t['type'] == 'INS']
    truth_del = [t for t in mut.truth if t['type'] == 'DEL']
    df_ins = df_insdel.loc[df_insdel['SVTYPE'] == 'INS']
    df_del = df_insdel.loc[df_insdel['SVTYPE'] == 'DEL']
    assert df_ins.shape[0] == len(truth_ins)
    assert df_del.shape[0] == len(truth_del)

    for t in truth_del:
        m = df_del.loc[df_del['POS'] == t['pos']]
        assert m.shape[0] == 1
        assert m.iloc[0]['SVLEN'] == t['len']
        assert m.iloc[0]['SEQ'] == t['seq']

    for t in truth_ins:
        m = df_ins.loc[(df_ins['POS'] <= t['pos']) & (df_ins['SVLEN'] == t['len'])]
        assert m.shape[0] == 1
        shift = t['pos'] - int(m.iloc[0]['POS'])
        assert shift == int(m.iloc[0]['LEFT_SHIFT'])
        if shift == 0:
            assert m.iloc[0]['SEQ'] == t['seq']

    # Same contig reverse-complemented must yield identical ref-space calls
    contig_rc = seqcodec.revcomp(contig)
    qry_store_rc = SeqStore({'tig1': contig_rc})
    df_align_rc = pd.DataFrame([_align_row('chr1', 'tig1', cigar_str, len(contig), rev=True)])
    df_snv_rc, df_insdel_rc = make_insdel_snv_calls(df_align_rc, ref_store, qry_store_rc, 'h1')

    assert list(df_snv_rc['POS']) == list(df_snv['POS'])
    assert list(df_snv_rc['ALT']) == list(df_snv['ALT'])
    assert list(df_insdel_rc['POS']) == list(df_insdel['POS'])
    assert list(df_insdel_rc['SEQ']) == list(df_insdel['SEQ'])
    # Query regions translate to original (reversed) contig coordinates
    assert (df_snv_rc['QRY_STRAND'] == '-').all()


def test_left_shift_in_tandem_repeat():
    # Reference: ...ACGACGACGACG...; delete one ACG unit placed mid-array; the
    # caller must record the homology-driven left shift.
    pad = seqcodec.encode('TTTTTTTTTT')
    unit = seqcodec.encode('ACG')
    ref = np.concatenate([pad, np.tile(unit, 6), pad])
    # Contig: remove the 4th unit (an I/D op placed mid-array by construction)
    contig = np.concatenate([pad, np.tile(unit, 5), pad])
    cigar_str = f'{10 + 9}=3D{9 + 10}='  # deletion at ref offset 19

    ref_store = SeqStore({'r': ref})
    qry_store = SeqStore({'q': contig})
    df_align = pd.DataFrame([_align_row('r', 'q', cigar_str, len(contig))])
    _, df_insdel = make_insdel_snv_calls(df_align, ref_store, qry_store, 'h1')

    assert df_insdel.shape[0] == 1
    row = df_insdel.iloc[0]
    assert row['SVTYPE'] == 'DEL' and row['SVLEN'] == 3
    assert row['LEFT_SHIFT'] == 9  # shifts back through three repeat units
    hom_l, hom_r = (int(v) for v in row['HOM_REF'].split(','))
    assert hom_l > 0 or hom_r > 0


def test_version_id():
    ids = pd.Series(['a', 'b', 'a', 'a', 'b.1'])
    out = list(version_id(ids))
    assert out == ['a', 'b', 'a.1', 'a.2', 'b.1']
    out2 = list(version_id(pd.Series(['x', 'x']), existing_id_set={'x', 'x.1'}))
    assert out2 == ['x.2', 'x.3']
