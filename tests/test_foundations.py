"""Foundations: sequence codec, k-mers, regions, FASTA I/O, CIGAR codec, config."""

import gzip
import os

import numpy as np
import pandas as pd
import pytest

from pav_tpu import seqcodec, kmer, regions, util, config
from pav_tpu.align import cigar as cg
from pav_tpu.io import fasta as fio


def test_encode_decode_roundtrip():
    s = 'ACGTNacgtnRYK'
    codes = seqcodec.encode(s)
    assert seqcodec.decode(codes) == 'ACGTNACGTNNNN'
    assert list(codes[:4]) == [0, 1, 2, 3]
    assert codes[4] == 4


def test_revcomp():
    assert seqcodec.revcomp_str('ACGTN') == 'NACGT'
    assert seqcodec.revcomp_str('AACCGGTT') == 'AACCGGTT'[::-1].translate(str.maketrans('ACGT', 'TGCA'))


def test_pack_unpack():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, 37).astype(np.uint8)
    packed = seqcodec.pack_2bit(codes)
    assert np.array_equal(seqcodec.unpack_2bit(packed, 37), codes)


def test_kmer_codec():
    ku = kmer.KmerUtil(5)
    val = ku.from_string('ACGTT')
    assert ku.to_string(val) == 'ACGTT'
    rc = ku.rev_complement(val)
    assert ku.to_string(rc) == 'AACGT'
    assert ku.canonical_complement(val) == min(int(val), int(rc))
    # Array form
    arr = np.array([val, rc], dtype=np.uint64)
    rcs = ku.rev_complement(arr)
    assert ku.to_string(rcs[0]) == 'AACGT'
    assert ku.to_string(rcs[1]) == 'ACGTT'


def test_kmer_stream_skips_ambiguous():
    ku = kmer.KmerUtil(3)
    codes = seqcodec.encode('ACGNTACG')
    pairs = kmer.stream(codes, ku, index=True)
    idx = [i for _, i in pairs]
    assert idx == [0, 4, 5]  # windows 1-3 cover the N at position 3
    assert ku.to_string(pairs[1][0]) == 'TAC'


def test_kmer_set_membership():
    ku = kmer.KmerUtil(7)
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, 500).astype(np.uint8)
    ks = kmer.kmer_set(codes, 7)
    vals, valid = kmer.kmer_codes(codes, 7)
    assert kmer.in_sorted(ks, vals[valid]).all()
    absent = np.array([ks[-1] + 1], dtype=np.uint64)
    assert not kmer.in_sorted(ks, absent).any()


def test_region_basics():
    r = regions.Region('chr1', 10, 20)
    assert len(r) == 10
    assert r.to_base1_string() == 'chr1:11-20'
    r2 = regions.region_from_string('chr1:11-20')
    assert r == r2
    rrev = regions.Region('chr1', 20, 10)
    assert rrev.is_rev and rrev.pos == 10 and rrev.end == 20


def test_region_expand_limits():
    r = regions.Region('chr1', 100, 200)
    r.expand(100, min_pos=0, max_end={'chr1': 1000})
    assert (r.pos, r.end) == (50, 250)
    r = regions.Region('chr1', 10, 20)
    r.expand(100, min_pos=0, max_end={'chr1': 1000}, shift=True)
    assert r.pos == 0 and r.end == 110  # upstream shortfall shifted downstream
    r = regions.Region('chr1', 900, 990)
    r.expand(100, min_pos=0, max_end={'chr1': 1000}, shift=True, balance=0.5)
    assert r.end == 1000 and r.pos == 810


def test_fasta_roundtrip(tmp_path):
    seqs = {'a': seqcodec.encode('ACGTACGTAC'), 'b': seqcodec.encode('TTTTNNNNGG')}
    path = str(tmp_path / 'test.fa.gz')
    fio.write_fasta(seqs, path)
    out = fio.read_fasta(path)
    assert list(out) == ['a', 'b']
    assert np.array_equal(out['a'], seqs['a'])
    assert np.array_equal(out['b'], seqs['b'])


def test_seqstore_ngaps():
    store = fio.SeqStore({'c1': seqcodec.encode('ACGTNNNACGTNA')})
    gaps = store.n_gap_table()
    assert gaps.values.tolist() == [['c1', 4, 7], ['c1', 11, 12]]


def test_cigar_roundtrip():
    s = '5H10=2X3I4D20=7S'
    lens, ops = cg.parse(s)
    assert cg.to_string(lens, ops) == s
    ref_bp, qry_bp, hl, sl, hr, sr = cg.count(lens, ops)
    assert ref_bp == 10 + 2 + 4 + 20
    assert qry_bp == 10 + 2 + 3 + 20
    assert (hl, sl, hr, sr) == (5, 0, 0, 7)


def test_cigar_m_rejected():
    lens, ops = cg.parse('10M')
    with pytest.raises(ValueError):
        cg.count(lens, ops)


def test_clip_soft_to_hard():
    lens, ops = cg.parse('3S10=4S2H')
    lens2, ops2 = cg.clip_soft_to_hard(lens, ops)
    assert cg.to_string(lens2, ops2) == '3H10=6H'


def test_match_bp():
    lens, ops = cg.parse('5H20=3X10=')
    assert cg.match_bp(lens, ops, right_end=False) == 20
    assert cg.match_bp(lens, ops, right_end=True) == 10


def test_merge_adjacent():
    lens, ops = cg.from_tuples([(5, '='), (0, 'X'), (3, '='), (2, 'I'), (1, 'I')])
    lens2, ops2 = cg.merge_adjacent(lens, ops)
    assert cg.to_string(lens2, ops2) == '8=3I'


def test_interval_index():
    idx = util.IntervalIndex([0, 10, 20, 15], [5, 18, 30, 40])
    hits = set(idx.overlap_indices(16, 21))
    assert hits == {1, 2, 3}
    assert not idx.any_overlap(5, 10)
    assert idx.any_overlap(4, 6)


def test_merge_intervals_pad():
    df = pd.DataFrame({'#CHROM': ['c', 'c', 'c'], 'POS': [100, 300, 5000], 'END': [200, 400, 5100]})
    out = util.merge_intervals(df, pad=500)
    assert out.values.tolist() == [['c', 100, 400], ['c', 5000, 5100]]


def test_config_layering():
    cfg = config.load_config({'inv_k_size': 21})
    assert cfg.inv_k_size == 21
    assert cfg.min_trim_tig_len == 1000
    ov = config.parse_config_override_string('min_trim_tig_len=500; aligner = native')
    cfg2 = config.override_config(cfg, ov)
    assert cfg2['min_trim_tig_len'] == '500'
    with pytest.raises(ValueError):
        config.override_config(cfg, {'reference': 'x.fa'})


def test_assembly_table(tmp_path):
    path = str(tmp_path / 'asm.tsv')
    with open(path, 'w') as fh:
        fh.write('NAME\tHAP1\tHAP2\tCONFIG\n')
        fh.write('samp1\ta.fa\tb.fa\tmin_trim_tig_len=500\n')
        fh.write('samp2\tc.fa\t\t\n')
    from pav_tpu import assembly_table as at
    df = at.read_assembly_table(path)
    assert list(df.columns) == ['HAP_h1', 'HAP_h2', 'CONFIG']
    assert at.get_hap_list(df, 'samp1') == ['h1', 'h2']
    assert at.get_hap_list(df, 'samp2') == ['h1']
    assert at.get_asm_config_override(df, 'samp1') == {'min_trim_tig_len': '500'}
