"""Graft entry points on the 8-device CPU mesh, and the concordance evaluator."""

import gzip
import os
import sys

import jax
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[1].shape[0] == 4


def test_dryrun_multichip():
    import __graft_entry__ as g
    assert len(jax.devices()) >= 8
    g.dryrun_multichip(8)


def test_eval_concordance(tmp_path):
    from pav_tpu import eval as ev

    def write_vcf(path, rows):
        with gzip.open(path, 'wt') as fh:
            fh.write('##fileformat=VCFv4.2\n')
            fh.write('#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n')
            for r in rows:
                fh.write('\t'.join(str(v) for v in r) + '\n')

    a = str(tmp_path / 'a.vcf.gz')
    b = str(tmp_path / 'b.vcf.gz')
    write_vcf(a, [
        ('c1', 101, 's1', 'A', 'G', '.', 'PASS', 'SVTYPE=SNV', 'GT', '1|0'),
        ('c1', 5001, 'i1', 'A', 'A' + 'T' * 100, '.', 'PASS', 'SVTYPE=INS;SVLEN=100', 'GT', '1|0'),
        ('c1', 9001, 'd1', 'A' + 'C' * 60, 'A', '.', 'PASS', 'SVTYPE=DEL;SVLEN=-60', 'GT', '1|0'),
    ])
    write_vcf(b, [
        ('c1', 101, 'x1', 'A', 'G', '.', 'PASS', 'SVTYPE=SNV', 'GT', '1|0'),
        ('c1', 5020, 'x2', 'A', 'A' + 'T' * 98, '.', 'PASS', 'SVTYPE=INS;SVLEN=98', 'GT', '1|0'),
        ('c1', 20000, 'x3', 'A', 'C', '.', 'PASS', 'SVTYPE=SNV', 'GT', '1|0'),
    ])
    rep = ev.concordance(a, b).set_index('SVTYPE')
    assert rep.loc['SNV', 'RECALL'] == 1.0
    assert rep.loc['SNV', 'PRECISION'] == 0.5
    assert rep.loc['INS', 'RECALL'] == 1.0     # 100 vs 98 at offset 19 merges
    assert rep.loc['DEL', 'RECALL'] == 0.0
