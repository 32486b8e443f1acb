"""QRY_FILTER end-to-end: FILTER_<hap> BEDs flow from the assembly table
through integration to the FAIL callset (reference: pavlib/call.py:521-539,
FILTER columns pavlib/pipeline.py:160,602-638)."""

import numpy as np
import pandas as pd
import pytest

from pav_tpu.assembly_table import (get_filter_spec, load_filter_regions,
                                    read_assembly_table)
from pav_tpu.io.fasta import SeqStore, write_fasta
from pav_tpu.pipeline import Pipeline, run as pipeline_run

from helpers import Mutator, random_seq


@pytest.fixture(scope='module')
def filtered_run(tmp_path_factory):
    base = tmp_path_factory.mktemp('qf')
    rng = np.random.default_rng(55)
    ref = random_seq(60000, rng)
    write_fasta({'chr1': ref}, str(base / 'ref.fa.gz'))

    # SNV-only haplotype: query coords == ref coords, so the filter BED is
    # easy to place in contig space.
    m = Mutator(ref)
    m.snv(10000, rng=rng)
    m.snv(30000, rng=rng)
    write_fasta({'tig1': m.finish()}, str(base / 'h1.fa'))

    # Filter out the contig region around the second SNV.
    with open(base / 'filter_h1.bed', 'w') as fh:
        fh.write('tig1\t29000\t31000\n')

    with open(base / 'assemblies.tsv', 'w') as fh:
        fh.write('NAME\tHAP_h1\tFILTER_h1\n')
        fh.write(f'samp\t{base}/h1.fa\t{base}/filter_h1.bed\n')

    results = pipeline_run(
        str(base / 'ref.fa.gz'), str(base / 'assemblies.tsv'),
        config={'aligner_min_chain_score': 300},
        run_dir=str(base / 'run'))
    return base, results


def test_filter_spec_parsing(filtered_run):
    base, _ = filtered_run
    tbl = read_assembly_table(str(base / 'assemblies.tsv'))
    spec = get_filter_spec(tbl, 'samp', 'h1')
    assert spec and spec.endswith('filter_h1.bed')
    df = load_filter_regions(spec, 'samp', 'h1')
    assert list(df.iloc[0]) == ['tig1', 29000, 31000]
    assert get_filter_spec(tbl, 'samp', 'h2') is None


def test_variant_in_filter_region_fails(filtered_run):
    _, results = filtered_run
    res_h1 = results['samp']['haps']['h1']
    df_pass, df_fail = res_h1.integrated['snv_snv']

    # SNV outside the filter region passes; SNV inside it gets QRY_FILTER.
    assert (df_pass['POS'] == 10000).any()
    assert not (df_pass['POS'] == 30000).any()
    hit = df_fail.loc[df_fail['POS'] == 30000]
    assert hit.shape[0] == 1
    assert 'QRY_FILTER' in hit.iloc[0]['FILTER']


def test_vcf_filter_column(filtered_run):
    """The VCF carries both tiers (reference vcf.snakefile:28-41); the filtered
    record's FILTER column says QRY_FILTER."""
    import gzip
    _, results = filtered_run
    with gzip.open(results['samp']['vcf'], 'rt') as fh:
        lines = fh.read().splitlines()
    assert any(l.startswith('##FILTER=<ID=QRY_FILTER') for l in lines)
    body = [l.split('\t') for l in lines if l and not l.startswith('#')]
    flt = {int(p[1]): p[6] for p in body}
    assert flt[10001] == 'PASS'
    assert 'QRY_FILTER' in flt[30001]


def test_no_filter_column_is_noop(tmp_path):
    rng = np.random.default_rng(56)
    ref = random_seq(30000, rng)
    m = Mutator(ref)
    m.snv(9000, rng=rng)
    pipe = Pipeline(SeqStore({'chr1': ref}), {'aligner_min_chain_score': 300})
    res = pipe.run_sample('s', {'h1': SeqStore({'t1': m.finish()})},
                          write_vcf=False)
    assert (res['haps']['h1'].integrated['snv_snv'][0]['POS'] == 9000).any()


def test_apply_qry_filter_tree_vectorized_parity():
    """The vectorized QRY_REGION parse + overlap join matches a per-row
    region_from_string/any_overlap loop on randomized tables."""
    import collections

    from pav_tpu.call.integrate import apply_qry_filter_tree
    from pav_tpu.regions import region_from_string
    from pav_tpu.util import build_interval_index_by_chrom

    rng = np.random.default_rng(77)
    n = 500
    tigs = np.array(['tig1', 'tig2', 'tig-x'])[rng.integers(0, 3, n)]
    pos = rng.integers(0, 50000, n)
    end = pos + rng.integers(1, 400, n)
    qry_region = [f'{t}:{p + 1}-{e}' for t, p, e in zip(tigs, pos, end)]
    df = pd.DataFrame({'QRY_REGION': qry_region},
                      index=rng.permutation(np.arange(10, 10 + n)))

    flt = pd.DataFrame({
        '#CHROM': np.array(['tig1', 'tig2', 'tig-x'])[rng.integers(0, 3, 40)],
        'POS': (fp := rng.integers(0, 50000, 40)),
        'END': fp + rng.integers(100, 2000, 40)})
    index = build_interval_index_by_chrom(flt)

    got = collections.defaultdict(set)
    apply_qry_filter_tree(df, index, got)

    want = collections.defaultdict(set)
    for i, rs in df['QRY_REGION'].items():
        region = region_from_string(rs)
        idx = index.get(region.chrom)
        if idx is not None and idx.any_overlap(region.pos, region.end):
            want[i].add('QRY_FILTER')
    assert dict(got) == dict(want)
    assert len(got) > 20   # the fixture actually exercises overlaps
