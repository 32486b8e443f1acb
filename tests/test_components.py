"""Component coverage: merger, redundancy, SAM round-trip, tracks, plots,
asmstat, batching, depth annotation."""

import gzip
import io
import os

import numpy as np
import pandas as pd
import pytest

from pav_tpu import asmstat, seqcodec, tracks
from pav_tpu.align import cigar as cg
from pav_tpu.align.table import read_sam, depth_table
from pav_tpu.call import merge as svmerge
from pav_tpu.call import redundancy
from pav_tpu.call.batching import merge_batch_table
from pav_tpu.call.integrate import annotate_depth, merge_haplotypes
from pav_tpu.io.fasta import SeqStore
from pav_tpu.io.sam import write_sam

from helpers import random_seq


def _var(chrom, pos, end, vid, svtype, svlen, seq='', **kw):
    row = {'#CHROM': chrom, 'POS': pos, 'END': end, 'ID': vid,
           'SVTYPE': svtype, 'SVLEN': svlen, 'SEQ': seq}
    row.update(kw)
    return row


def test_merge_variants_nr():
    h1 = pd.DataFrame([
        _var('c', 1000, 1001, 'c-1000-INS-100', 'INS', 100, 'A' * 100),
        _var('c', 5000, 5200, 'c-5000-DEL-200', 'DEL', 200, 'C' * 200),
        _var('c', 9000, 9050, 'c-9000-DEL-50', 'DEL', 50, 'G' * 50),
    ])
    h2 = pd.DataFrame([
        _var('c', 1010, 1011, 'c-1010-INS-100', 'INS', 100, 'A' * 100),   # merges (szro)
        _var('c', 5050, 5250, 'c-5050-DEL-200', 'DEL', 200, 'C' * 200),   # merges (ro)
        _var('c', 20000, 20300, 'c-20000-DEL-300', 'DEL', 300, 'T' * 300),  # new lead
    ])
    out = svmerge.merge_variants([h1, h2], ['h1', 'h2'],
                                 'nr::ro(0.5):szro(0.5,200,2):match')
    assert out.shape[0] == 4
    merged_ins = out.loc[out['SVTYPE'] == 'INS'].iloc[0]
    assert merged_ins['MERGE_SAMPLES'] == 'h1,h2'
    assert merged_ins['MERGE_VARIANTS'] == 'c-1000-INS-100,c-1010-INS-100'
    lone = out.loc[out['ID'] == 'c-20000-DEL-300'].iloc[0]
    assert lone['MERGE_SAMPLES'] == 'h2'


def test_merge_variants_match_rejects_sequence():
    h1 = pd.DataFrame([_var('c', 1000, 1001, 'a', 'INS', 100, 'A' * 100)])
    h2 = pd.DataFrame([_var('c', 1010, 1011, 'b', 'INS', 100, 'C' * 100)])
    out = svmerge.merge_variants([h1, h2], ['h1', 'h2'],
                                 'nr::ro(0.5):szro(0.5,200,2):match')
    assert out.shape[0] == 2  # different sequence content -> no merge
    out2 = svmerge.merge_variants([h1, h2], ['h1', 'h2'],
                                  'nr::ro(0.5):szro(0.5,200,2)')
    assert out2.shape[0] == 1  # without match, positions suffice


def test_merge_variants_snv_exact():
    h1 = pd.DataFrame([_var('c', 100, 101, 's1', 'SNV', 1, REF='A', ALT='G')])
    h2 = pd.DataFrame([
        _var('c', 100, 101, 's2', 'SNV', 1, REF='A', ALT='G'),
        _var('c', 100, 101, 's3', 'SNV', 1, REF='A', ALT='T'),
    ])
    out = svmerge.merge_variants([h1, h2], ['h1', 'h2'], 'nrsnv::exact')
    assert out.shape[0] == 2
    merged = out.loc[out['ID'] == 's1'].iloc[0]
    assert merged['MERGE_SAMPLES'] == 'h1,h2'


def test_seq_identity():
    assert svmerge._seq_identity('ACGT' * 50, 'ACGT' * 50) == 1.0
    a = 'ACGT' * 50
    b = a[:100] + 'T' + a[101:]
    assert svmerge._seq_identity(a, b) > 0.99
    assert svmerge._seq_identity('A' * 100, 'C' * 100) < 0.2


def test_redundancy_resolution():
    df_pass = pd.DataFrame([
        _var('c', 1000, 1200, 'keep', 'DEL', 200, 'A' * 200,
             ALIGN_INDEX='0', FILTER='PASS'),
    ])
    df_fail = pd.DataFrame([
        # Intersects PASS -> redundant
        _var('c', 1005, 1205, 'dup_of_pass', 'DEL', 200, 'A' * 200,
             ALIGN_INDEX='1', FILTER='TRIM'),
        # Two TRIM calls at the same site from different alignments -> keep one
        _var('c', 9000, 9300, 'site2_a', 'DEL', 300, 'G' * 300,
             ALIGN_INDEX='1', FILTER='TRIM'),
        _var('c', 9000, 9300, 'site2_b', 'DEL', 300, 'G' * 300,
             ALIGN_INDEX='2', FILTER='TRIM'),
        # non-TRIM fail is always kept
        _var('c', 50000, 50100, 'qryfil', 'DEL', 100, 'T' * 100,
             ALIGN_INDEX='2', FILTER='QRY_FILTER'),
    ])
    df_align = pd.DataFrame({
        'INDEX': [0, 1, 2], 'QRY_POS': [0, 0, 0],
        'QRY_END': [10000, 9000, 12000], 'MAPQ': [60, 60, 60],
    })
    nr, red = redundancy.resolve_fail_redundancy(
        df_pass, df_fail, df_align, 'nr::ro(0.5):szro(0.5,200,2):match')
    nr_ids = set(nr['ID'])
    assert 'qryfil' in nr_ids
    assert 'dup_of_pass' not in nr_ids
    assert len({'site2_a', 'site2_b'} & nr_ids) == 1
    assert set(red['ID']) == {'dup_of_pass'} | ({'site2_a', 'site2_b'} - nr_ids)


def test_sam_roundtrip(tmp_path):
    rng = np.random.default_rng(55)
    ref = random_seq(5000, rng)
    contig = ref[1000:4000].copy()
    contig[500] = (contig[500] + 1) % 4

    from pav_tpu.align.aligner import Aligner
    ref_store = SeqStore({'chrA': ref})
    qry_store = SeqStore({'q1': contig})
    df = Aligner(ref_store, {'aligner_min_chain_score': 200}).align_store(qry_store, 'h1')
    assert df.shape[0] == 1

    sam_path = str(tmp_path / 'out.sam')
    write_sam(df, qry_store, ref_store.fai(), sam_path)
    df2 = read_sam(sam_path, qry_store.fai(), 'h1')
    assert df2.shape[0] == 1
    for col in ('#CHROM', 'POS', 'END', 'QRY_POS', 'QRY_END', 'REV'):
        assert df.iloc[0][col] == df2.iloc[0][col], col
    # CIGAR bodies equal after clip normalization (S became H on re-ingest)
    l1, o1 = cg.parse(df.iloc[0]['CIGAR'])
    l2, o2 = cg.parse(df2.iloc[0]['CIGAR'])
    body1 = [(int(l), int(o)) for l, o in zip(l1, o1) if o not in (cg.S, cg.H)]
    body2 = [(int(l), int(o)) for l, o in zip(l2, o2) if o not in (cg.S, cg.H)]
    assert body1 == body2


def test_tracks(tmp_path):
    df_var = pd.DataFrame([
        _var('c', 100, 300, 'v1', 'DEL', 200, FILTER='PASS'),
        _var('c', 500, 501, 'v2', 'INS', 50, FILTER='PASS'),
    ])
    path = str(tmp_path / 'var.bed.gz')
    tracks.variant_track(df_var, path)
    with gzip.open(path, 'rt') as fh:
        lines = fh.read().splitlines()
    assert lines[0].startswith('track')
    assert len(lines) == 3

    df_align = pd.DataFrame([{
        '#CHROM': 'c', 'POS': 0, 'END': 1000, 'QRY_ID': 'q', 'QRY_POS': 0,
        'QRY_END': 1000, 'MAPQ': 60, 'REV': False, 'HAP': 'h1', 'INDEX': 0,
    }])
    path2 = str(tmp_path / 'aln.bed')
    tracks.alignment_track(df_align, path2)
    assert open(path2).read().count('\n') == 2


def test_plots(tmp_path):
    from pav_tpu import plot as pplot
    rng = np.random.default_rng(66)
    ref = random_seq(3000, rng)
    tig = np.concatenate([ref[:1000], seqcodec.revcomp(ref[1000:2000]), ref[2000:]])
    ax = pplot.kmer_dotplot(ref, tig, k=21)
    assert ax is not None

    df_density = pd.DataFrame({
        'INDEX': np.arange(100),
        'STATE_MER': [0] * 40 + [2] * 30 + [0] * 30,
        'STATE': [0] * 40 + [2] * 30 + [0] * 30,
        'KERN_FWD': np.linspace(1, 0, 100),
        'KERN_FWDREV': np.zeros(100),
        'KERN_REV': np.linspace(0, 1, 100),
    })
    out = str(tmp_path / 'density.png')
    pplot.density_plot(df_density, title='test', out_path=out)
    assert os.path.getsize(out) > 1000


def test_asmstat():
    store = SeqStore({'a': np.zeros(100, dtype=np.uint8),
                      'b': np.zeros(300, dtype=np.uint8),
                      'c': np.zeros(50, dtype=np.uint8)})
    stats = asmstat.asm_stats(store)
    assert stats['CONTIGS'] == 3
    assert stats['TOTAL_BP'] == 450
    assert stats['N50'] == 300


def test_merge_batch_table():
    fai = {f'chr{i}': (25 - i) * 1000 for i in range(24)}
    df = merge_batch_table(fai, batch_count=4)
    sizes = df.groupby('BATCH')['LEN'].sum()
    assert len(sizes) == 4
    assert sizes.max() / sizes.min() < 1.5  # balanced bins


def test_bam_writer_roundtrip(tmp_path):
    """write_bam output parses with an independent reader (Python gzip +
    struct per the SAM spec §4), and the .bai has coherent structure."""
    import struct

    from pav_tpu.io.sam import write_bam

    rng = np.random.default_rng(9)
    seqs = {f'q{i}': rng.integers(0, 4, 500).astype(np.uint8) for i in range(4)}
    store = SeqStore(seqs)
    rows = []
    for i, qid in enumerate(seqs):
        rows.append({
            '#CHROM': 'chrA' if i < 2 else 'chrB', 'POS': 100 + 50 * i,
            'END': 100 + 50 * i + 480, 'INDEX': i, 'QRY_ID': qid,
            'QRY_POS': 10, 'QRY_END': 490, 'QRY_LEN': 500, 'MAPQ': 60,
            'REV': bool(i % 2), 'FLAGS': '0x0010' if i % 2 else '0x0000',
            'HAP': 'h1', 'CIGAR': '10H230=5I245=10H', 'RG': 'NA',
        })
    df = pd.DataFrame(rows)
    fai = {'chrA': 10000, 'chrB': 10000}
    path = str(tmp_path / 'out.bam')
    write_bam(df, store, fai, path)

    # Independent decode: BGZF blocks are concatenated gzip members.
    raw = gzip.open(path, 'rb').read()
    assert raw[:4] == b'BAM\x01'
    off = 4
    (l_text,) = struct.unpack_from('<i', raw, off); off += 4
    text = raw[off:off + l_text].decode(); off += l_text
    assert 'SN:chrA' in text and 'SN:chrB' in text
    (n_ref,) = struct.unpack_from('<i', raw, off); off += 4
    names = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from('<i', raw, off); off += 4
        names.append(raw[off:off + l_name - 1].decode()); off += l_name
        (l_ref,) = struct.unpack_from('<i', raw, off); off += 4
        assert l_ref == 10000
    assert names == ['chrA', 'chrB']

    nib2base = {1: 'A', 2: 'C', 4: 'G', 8: 'T', 15: 'N'}
    got = []
    while off < len(raw):
        (bs,) = struct.unpack_from('<i', raw, off); off += 4
        rec_end = off + bs
        rid, pos, l_rn, mapq, _bin, n_cig, flag, l_seq, _, _, _ = \
            struct.unpack_from('<iiBBHHHiiii', raw, off)
        off += 32
        rname = raw[off:off + l_rn - 1].decode(); off += l_rn
        cig = struct.unpack_from(f'<{n_cig}I', raw, off); off += 4 * n_cig
        cigar = ''.join(f'{c >> 4}{"MIDNSHP=X"[c & 15]}' for c in cig)
        seq = ''.join(
            nib2base[(raw[off + k // 2] >> (4 if k % 2 == 0 else 0)) & 15]
            for k in range(l_seq))
        got.append((names[rid], pos, rname, mapq, flag, cigar, seq))
        off = rec_end

    assert len(got) == 4
    want = df.sort_values(['#CHROM', 'POS'])
    for (chrom, pos, rname, mapq, flag, cigar, seq), (_, row) in zip(
            got, want.iterrows()):
        assert chrom == row['#CHROM'] and pos == row['POS'] and rname == row['QRY_ID']
        assert mapq == 60 and cigar == '10S230=5I245=10S'  # hard->soft
        codes = store.fetch_codes(row['QRY_ID'], rev_compl=bool(row['REV']))
        assert seq == seqcodec.decode(codes)
        assert (flag & 0x10) == (0x10 if row['REV'] else 0)

    # BAI structure: magic, per-ref bin/linear sections parse to completion.
    bai = open(path + '.bai', 'rb').read()
    assert bai[:4] == b'BAI\x01'
    (n_ref_i,) = struct.unpack_from('<i', bai, 4)
    assert n_ref_i == 2
    off = 8
    total_chunks = 0
    for _ in range(n_ref_i):
        (n_bin,) = struct.unpack_from('<i', bai, off); off += 4
        for _ in range(n_bin):
            _b, n_chunk = struct.unpack_from('<Ii', bai, off); off += 8
            total_chunks += n_chunk
            off += 16 * n_chunk
        (n_intv,) = struct.unpack_from('<i', bai, off); off += 4 + 8 * n_intv
    # Adjacent same-bin records coalesce into one chunk; 2 refs -> >= 2.
    assert off == len(bai) and total_chunks >= 2


def test_merge_sharded_by_chrom_batches():
    """Chromosome-batched merge (pipeline._merge_all sharding) reproduces the
    unsharded merge exactly: per-chromosome merges are independent, so
    concat+sort over batches equals one full merge."""
    rng = np.random.default_rng(5)
    chroms = [f'chr{i}' for i in range(6)]

    def hap_calls(seed):
        r = np.random.default_rng(seed)
        rows = []
        for chrom in chroms:
            for _ in range(8):
                pos = int(r.integers(0, 50000))
                ln = int(r.integers(50, 400))
                svtype = 'INS' if r.random() < 0.5 else 'DEL'
                end = pos + 1 if svtype == 'INS' else pos + ln
                rows.append(_var(chrom, pos, end, f'{chrom}-{pos + 1}-{svtype}-{ln}',
                                 svtype, ln, 'ACGT' * (ln // 4 + 1)))
        return pd.DataFrame(rows).drop_duplicates('ID')

    h1 = hap_calls(101)
    # h2 shares some of h1's calls jittered (to exercise merging) plus its own.
    h2 = pd.concat([hap_calls(202), h1.sample(10, random_state=3).assign(
        POS=lambda d: d['POS'] + 20, END=lambda d: d['END'] + 20,
        ID=lambda d: d['ID'] + '-b')]).drop_duplicates('ID')

    callable_df = pd.DataFrame({
        '#CHROM': chroms, 'POS': [0] * 6, 'END': [60000] * 6})
    strategy = 'nr::ro(0.5):szro(0.5,200,2):match'

    full = merge_haplotypes([h1, h2], [callable_df, callable_df], ['h1', 'h2'],
                            strategy)

    batch_df = merge_batch_table({c: 60000 - i for i, c in enumerate(chroms)},
                                 batch_count=3)
    parts = []
    for b in sorted(batch_df['BATCH'].unique()):
        sub = set(batch_df.index[batch_df['BATCH'] == b])
        parts.append(merge_haplotypes([h1, h2], [callable_df, callable_df],
                                      ['h1', 'h2'], strategy, subset_chrom=sub))
    sharded = pd.concat(parts).sort_values(['#CHROM', 'POS', 'END', 'ID'])

    assert full.shape[0] == sharded.shape[0] > 40
    for col in full.columns:
        assert (full[col].astype(str).to_numpy()
                == sharded[col].astype(str).to_numpy()).all(), f'col {col}'


def test_annotate_depth_spanning():
    df_depth = pd.DataFrame({
        '#CHROM': ['c'] * 3, 'POS': [0, 100, 200], 'END': [100, 200, 300],
        'DEPTH': [1, 0, 2], 'QRY_ID': ['q1', '', 'q1,q2'],
    })
    df_var = pd.DataFrame([
        _var('c', 10, 20, 'a', 'DEL', 10),       # inside depth-1
        _var('c', 50, 250, 'b', 'DEL', 200),     # spans all three
        _var('c', 299, 300, 'ins_end', 'INS', 5),
    ])
    out = annotate_depth(df_var, df_depth)
    assert out.loc[out['ID'] == 'a', 'COV_MEAN'].iloc[0] == 1
    b = out.loc[out['ID'] == 'b'].iloc[0]
    assert abs(b['COV_MEAN'] - (50 * 1 + 100 * 0 + 50 * 2) / 200) < 1e-9
    assert abs(b['COV_PROP'] - 100 / 200) < 1e-9
    assert out.loc[out['ID'] == 'ins_end', 'COV_MEAN'].iloc[0] == 2


def test_join_ragged():
    from pav_tpu.util import join_ragged

    flat = np.array(['a', 'b', 'c', 'd', 'e', 'f'], dtype=object)
    starts = np.array([0, 1, 3])
    counts = np.array([1, 2, 3])
    out = join_ragged(flat, starts, counts, ';')
    assert out.tolist() == ['a', 'b;c', 'd;e;f']
    # Empty input and single groups
    assert join_ragged(np.zeros(0, dtype=object), [], [], ',').tolist() == []
    assert join_ragged(flat, [5], [1], ',').tolist() == ['f']
    # Matches the naive join for a randomized ragged layout
    rng = np.random.default_rng(3)
    counts = rng.integers(1, 5, 50)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    flat = np.array([str(v) for v in rng.integers(0, 100, int(counts.sum()))],
                    dtype=object)
    expect = [','.join(flat[s:s + c]) for s, c in zip(starts, counts)]
    assert join_ragged(flat, starts, counts, ',').tolist() == expect
    # Zero-count groups join to '' (not the first element of the next group)
    flat = np.array(['a', 'b', 'c'], dtype=object)
    out = join_ragged(flat, [0, 1, 1, 2], [1, 0, 1, 1], ',')
    assert out.tolist() == ['a', '', 'b', 'c']


def test_contains_batch_matches_scalar():
    from pav_tpu.util import IntervalIndex

    rng = np.random.default_rng(5)
    starts = rng.integers(0, 1000, 40)
    ends = starts + rng.integers(1, 300, 40)
    idx = IntervalIndex(starts, ends)
    qs = rng.integers(0, 1200, 200)
    qe = qs + rng.integers(0, 250, 200)
    batch = idx.contains_batch(qs, qe)
    for i in range(len(qs)):
        assert batch[i] == idx.any_contains(int(qs[i]), int(qe[i])), i
    # Empty index
    empty = IntervalIndex(np.zeros(0, np.int64), np.zeros(0, np.int64))
    assert not empty.contains_batch(qs[:3], qe[:3]).any()
