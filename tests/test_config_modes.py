"""Configuration-mode behavior: redundant_callset, inv SVLEN bounds, inv_inner,
merge-strategy overrides, QRY_FILTER regions."""

import os

import numpy as np
import pandas as pd
import pytest

from pav_tpu.call.integrate import integrate_sources, get_merge_params
from pav_tpu.config import load_config

from helpers import random_seq


def _depth(chrom='c', length=100000):
    return pd.DataFrame({'#CHROM': [chrom], 'POS': [0], 'END': [length],
                         'DEPTH': [1], 'QRY_ID': ['t']})


def _insdel(rows):
    cols = ['#CHROM', 'POS', 'END', 'ID', 'SVTYPE', 'SVLEN', 'HAP',
            'QRY_REGION', 'QRY_STRAND', 'CI', 'ALIGN_INDEX', 'LEFT_SHIFT',
            'HOM_REF', 'HOM_TIG', 'CALL_SOURCE', 'SEQ', 'FILTER']
    out = []
    for r in rows:
        base = {'HAP': 'h1', 'QRY_REGION': 't:1-1', 'QRY_STRAND': '+', 'CI': 0,
                'ALIGN_INDEX': 0, 'LEFT_SHIFT': 0, 'HOM_REF': '0,0',
                'HOM_TIG': '0,0', 'CALL_SOURCE': 'CIGAR', 'SEQ': 'A',
                'FILTER': 'PASS'}
        base.update(r)
        out.append(base)
    return pd.DataFrame(out, columns=cols)


def _snv(rows):
    cols = ['#CHROM', 'POS', 'END', 'ID', 'SVTYPE', 'SVLEN', 'REF', 'ALT',
            'HAP', 'QRY_REGION', 'QRY_STRAND', 'CI', 'ALIGN_INDEX',
            'CALL_SOURCE', 'FILTER']
    out = []
    for r in rows:
        base = {'SVTYPE': 'SNV', 'SVLEN': 1, 'REF': 'A', 'ALT': 'G',
                'HAP': 'h1', 'QRY_REGION': 't:1-1', 'QRY_STRAND': '+', 'CI': 0,
                'ALIGN_INDEX': 0, 'CALL_SOURCE': 'CIGAR', 'FILTER': 'PASS'}
        base.update(r)
        out.append(base)
    return pd.DataFrame(out, columns=cols)


_EMPTY_INV = pd.DataFrame([], columns=[
    '#CHROM', 'POS', 'END', 'ID', 'SVTYPE', 'SVLEN', 'HAP', 'QRY_REGION',
    'QRY_STRAND', 'CI', 'RGN_REF_INNER', 'RGN_QRY_INNER', 'RGN_REF_DISC',
    'RGN_QRY_DISC', 'FLAG_ID', 'FLAG_TYPE', 'ALIGN_INDEX', 'CALL_SOURCE',
    'FILTER', 'SEQ'])


def _run_integrate(config, df_insdel=None, df_snv=None, df_lg_del=None,
                   df_inv=None):
    empty_insdel = _insdel([])
    empty_snv = _snv([])
    return integrate_sources(
        df_insdel if df_insdel is not None else empty_insdel,
        df_snv if df_snv is not None else empty_snv,
        empty_insdel,
        df_lg_del if df_lg_del is not None else empty_insdel,
        _EMPTY_INV, df_inv if df_inv is not None else _EMPTY_INV,
        _depth(), load_config(config))


def test_compound_filter_marks_small_inside_large():
    lg_del = _insdel([
        {'#CHROM': 'c', 'POS': 1000, 'END': 3000, 'ID': 'bigdel',
         'SVTYPE': 'DEL', 'SVLEN': 2000, 'CALL_SOURCE': 'ALNTRUNC'},
    ])
    snv = _snv([
        {'#CHROM': 'c', 'POS': 2000, 'END': 2001, 'ID': 'snv_in'},
        {'#CHROM': 'c', 'POS': 50000, 'END': 50001, 'ID': 'snv_out'},
    ])
    out = _run_integrate({}, df_snv=snv, df_lg_del=lg_del)
    snv_pass, snv_fail = out['snv_snv']
    assert 'snv_out' in set(snv_pass['ID'])
    assert 'snv_in' in set(snv_fail['ID'])
    assert (snv_fail.loc[snv_fail['ID'] == 'snv_in', 'FILTER'] == 'COMPOUND').all()
    assert (snv_fail.loc[snv_fail['ID'] == 'snv_in', 'COMPOUND'] == 'bigdel').all()


def test_redundant_callset_disables_compound():
    lg_del = _insdel([
        {'#CHROM': 'c', 'POS': 1000, 'END': 3000, 'ID': 'bigdel',
         'SVTYPE': 'DEL', 'SVLEN': 2000, 'CALL_SOURCE': 'ALNTRUNC'},
    ])
    snv = _snv([{'#CHROM': 'c', 'POS': 2000, 'END': 2001, 'ID': 'snv_in'}])
    out = _run_integrate({'redundant_callset': True}, df_snv=snv, df_lg_del=lg_del)
    snv_pass, _ = out['snv_snv']
    assert 'snv_in' in set(snv_pass['ID'])


def test_inv_svlen_bounds():
    inv = _EMPTY_INV.copy()
    inv.loc[0] = {c: '' for c in inv.columns}
    inv.loc[0, ['#CHROM', 'POS', 'END', 'ID', 'SVTYPE', 'SVLEN', 'HAP',
                'QRY_REGION', 'QRY_STRAND', 'CALL_SOURCE', 'FILTER']] = \
        ['c', 10000, 10400, 'inv1', 'INV', 400, 'h1', 't:1-400', '+',
         'FLAG-DEN', 'PASS']
    out = _run_integrate({'inv_min': 500}, df_inv=inv)
    inv_pass, inv_fail = out['sv_inv']
    assert inv_pass.shape[0] == 0
    assert (inv_fail['FILTER'] == 'SVLEN').all()

    out2 = _run_integrate({'inv_min': 100}, df_inv=inv)
    assert out2['sv_inv'][0].shape[0] == 1


def test_qry_filter_regions():
    snv = _snv([
        {'#CHROM': 'c', 'POS': 100, 'END': 101, 'ID': 's1',
         'QRY_REGION': 't:1000-1000'},
        {'#CHROM': 'c', 'POS': 200, 'END': 201, 'ID': 's2',
         'QRY_REGION': 't:90000-90000'},
    ])
    qry_filter = pd.DataFrame({'#CHROM': ['t'], 'POS': [500], 'END': [2000]})
    out = integrate_sources(
        _insdel([]), snv, _insdel([]), _insdel([]), _EMPTY_INV, _EMPTY_INV,
        _depth(), load_config({}), qry_filter_df=qry_filter)
    snv_pass, snv_fail = out['snv_snv']
    assert set(snv_pass['ID']) == {'s2'}
    assert (snv_fail['FILTER'] == 'QRY_FILTER').all()


def test_merge_param_overrides():
    cfg = load_config({'merge_ins': 'nr::ro(0.8)', 'merge_snv': 'nrsnv::exact'})
    assert get_merge_params('ins', cfg) == 'nr::ro(0.8)'
    assert get_merge_params('del', cfg).startswith('nr::')  # falls to default
    cfg2 = load_config({'merge_insdel': 'nr::ro(0.9)'})
    assert get_merge_params('del', cfg2) == 'nr::ro(0.9)'
    assert get_merge_params('snv', cfg2) == 'nrsnv::exact'


def test_reference_config_compat_keys():
    """Reference-named config keys work unmodified: aligner=minimap2/lra map
    to engine presets, minimap2_params scoring flags apply, merge_svindel is
    honored (CONFIG.md documents it; reference code reads merge_insdel), and
    inv_min_expand is the reference's name for the expand count."""
    from pav_tpu.align.aligner.core import Aligner, _parse_minimap2_scoring
    from pav_tpu.call.integrate import get_merge_params
    from pav_tpu.io.fasta import SeqStore
    import numpy as np

    sc = _parse_minimap2_scoring('-x asm20 -m 10000 -O 6,60 -E 3,2 -B 4 -a --eqx')
    assert sc == {'mismatch': -4, 'gap_open': (6, 60), 'gap_ext': (3, 2)}

    ref = SeqStore({'c': np.zeros(2000, dtype=np.uint8)})
    al = Aligner(ref, {'aligner': 'minimap2',
                       'minimap2_params': '-O 6,60 -E 3,2 -B 4'})
    assert al.scoring['mismatch'] == -4
    assert al.scoring['gap_open'] == (6, 60)
    assert al.scoring['gap_ext'] == (3, 2)
    al2 = Aligner(ref, {'aligner': 'lra'})
    assert al2.k == 15    # native-sensitive preset

    assert get_merge_params('ins', {'merge_svindel': 'nr::ro(0.9)'}) == 'nr::ro(0.9)'
    # Reference code's chain still wins over the documented alias.
    assert get_merge_params(
        'ins', {'merge_insdel': 'nr::ro(0.8)',
                'merge_svindel': 'nr::ro(0.9)'}) == 'nr::ro(0.8)'
