"""Input-format coverage: FASTQ, GFA, FOFN recursion, empty-haplotype handling."""

import gzip
import os

import numpy as np
import pytest

from pav_tpu.assembly_table import expand_input, load_haplotype_seqs
from pav_tpu.io.fasta import read_seq_file


def test_fastq(tmp_path):
    path = str(tmp_path / 'x.fq.gz')
    with gzip.open(path, 'wt') as fh:
        fh.write('@read1 extra\nACGT\n+\nIIII\n@read2\nGGCC\n+\nIIII\n')
    seqs = read_seq_file(path)
    assert list(seqs) == ['read1', 'read2']
    assert len(seqs['read1']) == 4


def test_gfa(tmp_path):
    path = str(tmp_path / 'x.gfa')
    with open(path, 'w') as fh:
        fh.write('H\tVN:Z:1.0\n')
        fh.write('S\tseg1\tACGTACGT\n')
        fh.write('S\tseg2\t*\n')  # no sequence -> skipped
        fh.write('L\tseg1\t+\tseg2\t+\t0M\n')
        fh.write('S\tseg3\tTTTT\tLN:i:4\n')
    seqs = read_seq_file(path)
    assert list(seqs) == ['seg1', 'seg3']


def test_fofn_recursion_and_wildcards(tmp_path):
    fa1 = tmp_path / 'a.fa'
    fa1.write_text('>c1\nACGT\n')
    fa2 = tmp_path / 'samp1_h2.fa'
    fa2.write_text('>c2\nGGGG\n')
    inner = tmp_path / 'inner.fofn'
    inner.write_text('a.fa\n')
    outer = tmp_path / 'outer.fofn'
    outer.write_text(f'inner.fofn\n{tmp_path}/{{asm_name}}_{{hap}}.fa\n')

    files = expand_input(str(outer), 'samp1', 'h2')
    assert files == [str(fa1), str(fa2)]

    store = load_haplotype_seqs(str(outer), 'samp1', 'h2')
    assert set(store.names()) == {'c1', 'c2'}


def test_empty_file_is_missing_haplotype(tmp_path):
    empty = tmp_path / 'empty.fa'
    empty.write_text('')
    store = load_haplotype_seqs(str(empty), 's', 'h1')
    assert store.names() == []


def test_semicolon_list(tmp_path):
    fa1 = tmp_path / 'a.fa'
    fa1.write_text('>c1\nACGT\n')
    fa2 = tmp_path / 'b.fa'
    fa2.write_text('>c2\nTTTT\n')
    store = load_haplotype_seqs(f'{fa1} ; {fa2}', 's', 'h1')
    assert set(store.names()) == {'c1', 'c2'}
