"""Multi-sample run through the assembly table and CLI entry, plus resume."""

import gzip
import os

import numpy as np
import pytest

from pav_tpu import seqcodec
from pav_tpu.io.fasta import write_fasta
from pav_tpu.pipeline import run as pipeline_run

from helpers import Mutator, random_seq


@pytest.fixture(scope='module')
def workspace(tmp_path_factory):
    base = tmp_path_factory.mktemp('ws')
    rng = np.random.default_rng(81)
    ref = random_seq(60000, rng)
    write_fasta({'chr1': ref}, str(base / 'ref.fa.gz'))

    def hap(seed):
        rng2 = np.random.default_rng(seed)
        m = Mutator(ref)
        m.snv(10000, rng=rng2)
        m.ins(30000, random_seq(80, rng2))
        return m.finish()

    # Sample 1: two haplotypes; sample 2: one haplotype + one missing (empty cell)
    write_fasta({'s1h1': hap(1)}, str(base / 's1_h1.fa'))
    write_fasta({'s1h2': hap(2)}, str(base / 's1_h2.fa'))
    write_fasta({'s2h1': hap(3)}, str(base / 's2_h1.fa'))

    with open(base / 'assemblies.tsv', 'w') as fh:
        fh.write('NAME\tHAP1\tHAP2\n')
        fh.write(f's1\t{base}/s1_h1.fa\t{base}/s1_h2.fa\n')
        fh.write(f's2\t{base}/s2_h1.fa\t\n')
    return base


def test_run_multisample(workspace):
    base = workspace
    results = pipeline_run(
        str(base / 'ref.fa.gz'), str(base / 'assemblies.tsv'),
        config={'aligner_min_chain_score': 300},
        run_dir=str(base / 'run'))

    assert set(results) == {'s1', 's2'}
    for asm in ('s1', 's2'):
        vcf = results[asm]['vcf']
        assert os.path.isfile(vcf)
        with gzip.open(vcf, 'rt') as fh:
            body = [l for l in fh if not l.startswith('#')]
        assert len(body) >= 2  # at least the SNV and the INS

    # s2 is haploid: genotype column has a single allele
    with gzip.open(results['s2']['vcf'], 'rt') as fh:
        body = [l for l in fh if not l.startswith('#')]
    gts = {l.strip().split('\t')[-1] for l in body}
    assert gts <= {'1'}

    # Artifacts written for resume
    assert os.path.isfile(base / 'run' / 's1' / 'h1' / 'align_trim-none.tsv.gz')


def test_resume_from_artifacts(workspace):
    base = workspace
    from pav_tpu.pipeline import Pipeline
    from pav_tpu.config import load_config

    cfg = load_config({'aligner_min_chain_score': 300})
    pipe = Pipeline(str(base / 'ref.fa.gz'), cfg, run_dir=str(base / 'run'))
    res = pipe.run_sample(
        's1', {'h1': str(base / 's1_h1.fa'), 'h2': str(base / 's1_h2.fa')},
        resume=True)
    # Resumed (no aligner construction should have been needed)
    assert pipe._aligner is None
    assert res['merged'][('snv_snv', 'pass')].shape[0] >= 1


def test_cli_main(workspace, capsys):
    base = workspace
    from pav_tpu.__main__ import main
    rc = main(['--ref', str(base / 'ref.fa.gz'),
               '--assemblies', str(base / 'assemblies.tsv'),
               '--run-dir', str(base / 'run_cli'),
               '--sample', 's2',
               '--set', 'aligner_min_chain_score=300'])
    assert rc == 0
    out = capsys.readouterr().out
    assert 's2' in out and '.vcf.gz' in out
