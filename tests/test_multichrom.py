"""Multi-chromosome references, N gaps, and cross-chromosome contig handling."""

import os

import numpy as np
import pytest

from pav_tpu import seqcodec
from pav_tpu.io.fasta import SeqStore
from pav_tpu.pipeline import Pipeline

from helpers import Mutator, random_seq


def test_multichrom_calls_and_vcf(tmp_path):
    rng = np.random.default_rng(101)
    chr1 = random_seq(60000, rng)
    chr2 = random_seq(50000, rng)

    m1 = Mutator(chr1)
    m1.snv(10000, rng=rng)
    m1.ins(30000, random_seq(120, rng))
    h_chr1 = m1.finish()

    m2 = Mutator(chr2)
    m2.dele(20000, 200)
    m2.snv(40000, rng=rng)
    h_chr2 = m2.finish()

    ref = SeqStore({'chr1': chr1, 'chr2': chr2})
    pipeline = Pipeline(ref, {'aligner_min_chain_score': 500},
                        run_dir=str(tmp_path), log=open(os.devnull, 'w'))
    res = pipeline.run_sample(
        's', {'h1': SeqStore({'t1': h_chr1, 't2': h_chr2})})

    snv = res['merged'][('snv_snv', 'pass')]
    assert set(snv['#CHROM']) == {'chr1', 'chr2'}
    assert (snv.loc[snv['#CHROM'] == 'chr1', 'POS'] == 10000).any()
    assert (snv.loc[snv['#CHROM'] == 'chr2', 'POS'] == 40000).any()
    ins = res['merged'][('svindel_ins', 'pass')]
    assert (ins['SVLEN'] == 120).any()
    del_ = res['merged'][('svindel_del', 'pass')]
    assert ((del_['#CHROM'] == 'chr2') & (del_['SVLEN'] == 200)).any()

    # VCF sorted by chrom then pos with both contig headers.
    import gzip
    with gzip.open(res['vcf'], 'rt') as fh:
        lines = fh.read().splitlines()
    assert any('##contig=<ID=chr2,length=50000' in l for l in lines)
    body = [l.split('\t') for l in lines if l and not l.startswith('#')]
    chroms = [b[0] for b in body]
    assert chroms == sorted(chroms)


def test_n_gap_reference():
    rng = np.random.default_rng(103)
    ref_codes = random_seq(60000, rng)
    ref_codes[30000:30500] = 4  # N gap
    contig = np.concatenate([ref_codes[5000:29000], ref_codes[31000:55000]])

    ref = SeqStore({'c': ref_codes})
    assert ref.n_gap_table().shape[0] == 1

    pipeline = Pipeline(ref, {'aligner_min_chain_score': 500},
                        log=open(os.devnull, 'w'))
    res = pipeline.run_haplotype(SeqStore({'t': contig}), 'h1')
    # The 2kb removed region (including the N run) comes back as a deletion
    # (inline D or alignment-truncating), never as SNV calls inside the Ns.
    dels = res.integrated['svindel_del'][0]
    assert ((dels['POS'] <= 30000) & (dels['END'] >= 30500)).any()
    snv = res.integrated['snv_snv'][0]
    assert not ((snv['POS'] >= 30000) & (snv['POS'] < 30500)).any()


def test_contig_split_across_chromosomes():
    # A chimeric contig half-matching chr1 and half chr2 must produce one
    # record per chromosome (chains never cross group boundaries).
    rng = np.random.default_rng(104)
    chr1 = random_seq(40000, rng)
    chr2 = random_seq(40000, rng)
    chimera = np.concatenate([chr1[5000:25000], chr2[10000:30000]])

    ref = SeqStore({'chr1': chr1, 'chr2': chr2})
    pipeline = Pipeline(ref, {'aligner_min_chain_score': 500},
                        log=open(os.devnull, 'w'))
    res = pipeline.run_haplotype(SeqStore({'t': chimera}), 'h1')
    df = res.align_qryref
    assert set(df['#CHROM']) == {'chr1', 'chr2'}
    assert df.shape[0] == 2
