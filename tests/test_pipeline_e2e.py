"""End-to-end engine runs on synthetic diploid genomes with planted truth."""

import gzip

import numpy as np
import pandas as pd
import pytest

from pav_tpu import seqcodec
from pav_tpu.io.fasta import SeqStore
from pav_tpu.pipeline import Pipeline

from helpers import Mutator, random_seq


@pytest.fixture(scope='module')
def diploid_run(tmp_path_factory):
    rng = np.random.default_rng(71)
    ref = random_seq(150000, rng)

    # Haplotype 1: SNVs, indels, one large INS, one large DEL.
    m1 = Mutator(ref)
    m1.snv(10000, rng=rng)
    m1.ins(20000, random_seq(12, rng))
    m1.dele(30000, 7)
    m1.ins(50000, random_seq(250, rng))
    m1.dele(70000, 400)
    m1.snv(90000, rng=rng)
    h1 = m1.finish()

    # Haplotype 2: shares the SNV at 10000 and large INS at 50000 (hom),
    # plus a private SNV; also a 4kb inversion.
    m2 = Mutator(ref)
    m2.snv(10000, alt=int(m1.truth[0]['alt'] == 'A'), rng=rng)
    # Reuse exact same alt base as h1 for a hom call
    m2.truth[-1]['alt'] = m1.truth[0]['alt']
    m2.pieces[-1] = np.array([seqcodec.encode(m1.truth[0]['alt'])[0]], dtype=np.uint8)
    m2.ins(50000, seqcodec.encode(m1.truth[3]['seq']))
    m2.snv(60000, rng=rng)
    m2.inv(100000, 4000)
    h2 = m2.finish()

    run_dir = str(tmp_path_factory.mktemp('pav_run'))
    pipeline = Pipeline(SeqStore({'chr1': ref}),
                        {'aligner_min_chain_score': 500, 'artifacts': 'full'},
                        run_dir=run_dir)
    result = pipeline.run_sample(
        'samp1',
        {'h1': SeqStore({'tig1_1': h1}), 'h2': SeqStore({'tig2_1': h2})})
    return ref, m1, m2, result


def test_e2e_snv_recall(diploid_run):
    ref, m1, m2, result = diploid_run
    df = result['merged'][('snv_snv', 'pass')]
    truth_h1 = {t['pos'] for t in m1.truth if t['type'] == 'SNV'}
    truth_h2 = {t['pos'] for t in m2.truth if t['type'] == 'SNV'}
    called = set(df['POS'])
    missing = (truth_h1 | truth_h2) - called
    assert not missing, f'missed SNVs at {missing}'

    # The shared SNV must be genotyped 1|1 and merged from both haps.
    row = df.loc[df['POS'] == 10000].iloc[0]
    assert set(row['HAP'].split(';')) == {'h1', 'h2'}
    assert row['GT'] == '1|1'
    # Private h2 SNV: callable in h1 -> 0|1.
    row = df.loc[df['POS'] == 60000].iloc[0]
    assert row['GT'] == '0|1'


def test_e2e_svindel_recall(diploid_run):
    ref, m1, m2, result = diploid_run
    ins = result['merged'][('svindel_ins', 'pass')]
    del_ = result['merged'][('svindel_del', 'pass')]

    # Large INS (250bp) shared by both haps -> merged hom.
    m = ins.loc[ins['SVLEN'] == 250]
    assert m.shape[0] == 1
    assert set(m.iloc[0]['HAP'].split(';')) == {'h1', 'h2'}
    assert m.iloc[0]['GT'] == '1|1'

    # h1-only 400bp DEL.
    m = del_.loc[del_['SVLEN'] == 400]
    assert m.shape[0] == 1
    assert m.iloc[0]['HAP'] == 'h1'
    assert m.iloc[0]['GT'] == '1|0'

    # Small indels from h1.
    assert (ins['SVLEN'] == 12).any()
    assert (del_['SVLEN'] == 7).any()


def test_e2e_inversion(diploid_run):
    ref, m1, m2, result = diploid_run
    inv = result['merged'][('sv_inv', 'pass')]
    assert inv.shape[0] >= 1, 'inversion not called'
    row = inv.iloc[0]
    # 4kb inversion at 100000 (outer breakpoints may include homology flanks).
    assert abs(int(row['POS']) - 100000) < 500
    assert abs(int(row['SVLEN']) - 4000) < 1000
    assert row['HAP'] == 'h2'


def test_e2e_vcf_output(diploid_run):
    ref, m1, m2, result = diploid_run
    path = result['vcf']
    with gzip.open(path, 'rt') as fh:
        lines = fh.read().splitlines()
    header = [l for l in lines if l.startswith('##')]
    assert any(l.startswith('##fileformat=VCFv4.2') for l in header)
    assert any(l.startswith('##contig=<ID=chr1,length=150000') for l in header)
    body = [l for l in lines if l and not l.startswith('#')]
    assert len(body) >= 7
    cols = [l for l in lines if l.startswith('#CHROM')][0].split('\t')
    assert cols[-1] == 'samp1'
    # Parse a few records
    for line in body:
        parts = line.split('\t')
        assert len(parts) == 10
        assert parts[0] == 'chr1'
        int(parts[1])
    # SNV at 10000 (BED) -> VCF POS 10001, REF/ALT single bases.
    snv_lines = [l.split('\t') for l in body if l.split('\t')[1] == '10001']
    assert snv_lines and len(snv_lines[0][3]) == 1 and len(snv_lines[0][4]) == 1
    # INV uses symbolic ALT.
    assert any(p.split('\t')[4] == '<INV>' for p in body)

    # REF columns must match the reference sequence exactly, and indel REF/ALT
    # follow the anchor-base convention (VCF spec + reference vcf.py:225-243).
    for parts in (l.split('\t') for l in body):
        pos1, vref, valt, info = int(parts[1]), parts[3], parts[4], parts[7]
        if valt.startswith('<'):
            continue
        want = seqcodec.decode(ref[pos1 - 1: pos1 - 1 + len(vref)])
        assert vref == want, f'REF mismatch at {pos1}: {vref} != {want}'
        svtype = dict(kv.split('=', 1) for kv in info.split(';') if '=' in kv)['SVTYPE']
        if svtype == 'INS':
            assert len(valt) > len(vref) == 1 and valt[0] == vref
        elif svtype == 'DEL':
            assert len(vref) > len(valt) == 1 and vref[0] == valt
        elif svtype == 'SNV':
            assert len(vref) == len(valt) == 1 and vref != valt


def test_e2e_side_outputs(diploid_run):
    """BAM + per-inversion density tables and figures land in the run dir
    (reference: rules/align.snakefile:305-327, rules/figures.snakefile:97-269)."""
    import glob
    import os

    ref, m1, m2, result = diploid_run
    run_dir = os.path.dirname(result['vcf'])
    for hap in ('h1', 'h2'):
        hdir = os.path.join(run_dir, 'samp1', hap)
        bam = os.path.join(hdir, 'align_trim-qryref.bam')
        assert os.path.isfile(bam) and os.path.getsize(bam) > 100
        assert os.path.isfile(bam + '.bai')
        with open(bam, 'rb') as fh:
            import gzip as _gz
            assert _gz.open(fh, 'rb').read(4) == b'BAM\x01'
    # h2 carries the planted inversion -> density table + both figures.
    h2dir = os.path.join(run_dir, 'samp1', 'h2')
    dens = glob.glob(os.path.join(h2dir, 'inv_density', '*.tsv.gz'))
    figs = glob.glob(os.path.join(h2dir, 'figures', '*_density.png'))
    dots = glob.glob(os.path.join(h2dir, 'figures', '*_dotplot.png'))
    assert dens and figs and dots
    import pandas as pd
    df_dens = pd.read_csv(dens[0], sep='\t')
    assert {'INDEX', 'STATE_MER', 'KERN_FWD', 'KERN_REV'} <= set(df_dens.columns)


def test_e2e_bigbed_tracks(diploid_run):
    """artifacts=full emits native BigBed browser tracks next to the .bed.gz
    tracks, and they parse with the verifying reader (reference builds these
    via bedToBigBed: rules/tracks.snakefile:115,192)."""
    import glob
    import os

    from pav_tpu.io.bigbed import read_bigbed

    ref, m1, m2, result = diploid_run
    run_dir = os.path.dirname(result['vcf'])
    for hap in ('h1', 'h2'):
        hdir = os.path.join(run_dir, 'samp1', hap)
        bb = os.path.join(hdir, 'align_track.bb')
        assert os.path.isfile(bb), 'alignment BigBed missing'
        hdr, sizes, rows = read_bigbed(bb)
        assert rows and sizes.get('chr1') == 150000
        var_bbs = glob.glob(os.path.join(hdir, 'track_*.bb'))
        assert var_bbs, 'variant BigBed tracks missing'
        got_rows = 0
        for path in var_bbs:
            got_rows += len(read_bigbed(path)[2])
        assert got_rows > 0


def test_e2e_artifacts_written(diploid_run, ):
    ref, m1, m2, result = diploid_run
    res_h1 = result['haps']['h1']
    assert res_h1.align_none.shape[0] >= 1
    assert res_h1.callable.shape[0] >= 1
    # Depth table covers the whole chromosome contiguously.
    d = res_h1.depth_qry
    assert d.iloc[0]['POS'] == 0 and d.iloc[-1]['END'] == 150000
    assert (d['POS'].to_numpy()[1:] == d['END'].to_numpy()[:-1]).all()
