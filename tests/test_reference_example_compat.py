"""The reference's bundled example inputs parse as-is (the data files
themselves require downloads unavailable in this environment: EXAMPLE.md)."""

import json
import os

import pytest

REF_EXAMPLE = '/root/reference/files/example'


@pytest.mark.skipif(not os.path.isdir(REF_EXAMPLE), reason='reference absent')
def test_reference_assembly_table_parses():
    from pav_tpu.assembly_table import read_assembly_table, get_hap_list

    df = read_assembly_table(os.path.join(REF_EXAMPLE, 'assemblies.tsv'))
    assert list(df.index) == ['HG00733']
    assert get_hap_list(df, 'HG00733') == ['h1', 'h2']
    assert df.loc['HG00733', 'HAP_h1'].endswith('HG00733_22q12_h1.fa.gz')


@pytest.mark.skipif(not os.path.isdir(REF_EXAMPLE), reason='reference absent')
def test_reference_config_parses():
    from pav_tpu.config import load_config

    cfg = load_config(config_json=os.path.join(REF_EXAMPLE, 'config.json'))
    assert cfg['reference'].endswith('hg38.no_alt.fa.gz')
    # Framework defaults still present alongside the reference's keys.
    assert cfg['inv_k_size'] == 31
