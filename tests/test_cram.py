"""CRAM 3.0 container round trip: write with io.cram, decode with the
independent reader, and check records against the alignment table and BAM
conventions (reference output surface: scripts/reconstruct_sam.py:28-102 +
rules/align.snakefile:305-327)."""

import gzip

import numpy as np
import pandas as pd
import pytest

from helpers import random_seq

from pav_tpu import seqcodec
from pav_tpu.io.cram import (itf8, ltf8, read_cram, read_itf8, read_ltf8,
                             write_cram)
from pav_tpu.io.fasta import SeqStore


@pytest.mark.parametrize('v', [0, 1, 127, 128, 255, 16383, 16384,
                               (1 << 21) - 1, 1 << 21, (1 << 28) - 1,
                               1 << 28, (1 << 31) - 1, -1, -2, -100])
def test_itf8_roundtrip(v):
    buf = itf8(v)
    got, off = read_itf8(buf, 0)
    assert got == v and off == len(buf)


@pytest.mark.parametrize('v', [0, 127, 128, 16383, 1 << 20, 1 << 34,
                               (1 << 42) - 3, 1 << 50, (1 << 62), -1, -7])
def test_ltf8_roundtrip(v):
    buf = ltf8(v)
    got, off = read_ltf8(buf, 0)
    assert got == v and off == len(buf)


def _mini_alignment(rng):
    """Reference, a contig with SNVs + an indel, and its alignment row."""
    ref = random_seq(5000, rng)
    tig = ref[1000:4000].copy()
    tig[500] = (tig[500] + 1) % 4                 # SNV
    tig[700:703] = (tig[700:703] + 2) % 4         # 3-bp mismatch run
    tig = np.concatenate([tig[:1500], rng.integers(0, 4, 20).astype(np.uint8),
                          tig[1500:]])            # 20-bp insertion
    tig = np.concatenate([tig[:2200], tig[2230:]])  # 30-bp deletion
    cigar = '500=1X199=3X797=20I680=30D790='
    row = {
        '#CHROM': 'chr1', 'POS': 1000, 'END': 4000, 'INDEX': 0,
        'QRY_ID': 'tig1', 'QRY_POS': 0, 'QRY_END': len(tig),
        'RG': 'NA', 'MAPQ': 60, 'REV': False, 'FLAGS': 0, 'HAP': 'h1',
        'CIGAR': cigar,
    }
    return ref, tig, row


def test_cram_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    ref, tig, row = _mini_alignment(rng)
    df = pd.DataFrame([row])
    ref_store = SeqStore({'chr1': ref})
    qry_store = SeqStore({'tig1': tig})

    path = str(tmp_path / 'aln.cram')
    write_cram(df, qry_store, ref_store, path)

    header, records = read_cram(path)
    assert '@SQ\tSN:chr1\tLN:5000' in header
    assert len(records) == 1
    rec = records[0]
    assert rec['name'] == 'tig1'
    assert rec['pos'] == 1000
    assert rec['mapq'] == 60
    assert rec['cigar'] == row['CIGAR']
    assert rec['seq'] == seqcodec.decode(tig)

    # Index exists and addresses the slice's container.
    with gzip.open(path + '.crai', 'rt') as fh:
        lines = [ln.split('\t') for ln in fh.read().splitlines()]
    assert len(lines) == 1
    assert lines[0][0] == '0' and int(lines[0][1]) == 1001


def test_cram_multi_slice_multi_chrom(tmp_path):
    """Records spanning chromosomes and exceeding slice_records split into
    multiple containers, all decodable, coordinate-sorted per chromosome."""
    rng = np.random.default_rng(11)
    chroms = {f'chr{i}': random_seq(3000, rng) for i in (1, 2)}
    ref_store = SeqStore(chroms)
    rows, tigs = [], {}
    for i in range(7):
        chrom = 'chr1' if i < 4 else 'chr2'
        beg = 100 + 300 * i
        tig = chroms[chrom][beg:beg + 200].copy()
        tig[50] = (tig[50] + 1) % 4
        name = f'tig{i}'
        tigs[name] = tig
        rows.append({
            '#CHROM': chrom, 'POS': beg, 'END': beg + 200, 'INDEX': i,
            'QRY_ID': name, 'QRY_POS': 0, 'QRY_END': 200, 'RG': 'NA',
            'MAPQ': 40 + i, 'REV': False, 'FLAGS': 0, 'HAP': 'h1',
            'CIGAR': '50=1X149=',
        })
    df = pd.DataFrame(rows).sample(frac=1, random_state=3)  # shuffle
    path = str(tmp_path / 'multi.cram')
    write_cram(df, SeqStore(tigs), ref_store, path, slice_records=3)

    _, records = read_cram(path)
    assert len(records) == 7
    # Per-chromosome coordinate order, chr1 before chr2.
    ids = [r['chrom_id'] for r in records]
    assert ids == sorted(ids)
    for r in records:
        i = int(r['name'][3:])
        assert r['pos'] == 100 + 300 * i
        assert r['mapq'] == 40 + i
        assert r['seq'] == seqcodec.decode(tigs[r['name']])

    with gzip.open(path + '.crai', 'rt') as fh:
        n_slices = len(fh.read().splitlines())
    assert n_slices == 3   # chr1: 3+1 records -> 2 slices; chr2: 3 -> 1

def test_cram_hard_clip_expansion(tmp_path):
    """Hard clips re-expand to soft clips by default (full contig sequence
    in the record), matching write_bam and the reference reconstruction."""
    rng = np.random.default_rng(7)
    ref = random_seq(2000, rng)
    tig = np.concatenate([rng.integers(0, 4, 30).astype(np.uint8),
                          ref[500:900],
                          rng.integers(0, 4, 40).astype(np.uint8)])
    row = {
        '#CHROM': 'chr1', 'POS': 500, 'END': 900, 'INDEX': 0,
        'QRY_ID': 'tigH', 'QRY_POS': 30, 'QRY_END': 430, 'RG': 'NA',
        'MAPQ': 60, 'REV': False, 'FLAGS': 0, 'HAP': 'h1',
        'CIGAR': '30H400=40H',
    }
    path = str(tmp_path / 'clip.cram')
    write_cram(pd.DataFrame([row]), SeqStore({'tigH': tig}),
               SeqStore({'chr1': ref}), path)
    _, records = read_cram(path)
    assert records[0]['cigar'] == '30S400=40S'
    assert records[0]['seq'] == seqcodec.decode(tig)
