"""Differential parity tests against the reference implementation.

The reference tree (read-only at /root/reference) cannot be imported wholesale
(its imports need pysam/Bio/svpoplib, absent here), but its core algorithmic
functions are dependency-light. These tests extract those functions from the
reference source BY AST at test time (nothing is copied into this repo) and
compare outputs with ours on randomized inputs — direct evidence of semantic
parity for homology search and trimming cut-site selection.
"""

import ast
import os
import types

import numpy as np
import pandas as pd
import pytest

REF_ROOT = '/root/reference'


def _extract_functions(path, names, extra_globals=None):
    """Exec selected top-level function defs from a reference source file."""
    with open(path) as fh:
        tree = ast.parse(fh.read())
    selected = [node for node in tree.body
                if isinstance(node, ast.FunctionDef) and node.name in names]
    assert len(selected) == len(names), f'missing defs in {path}'
    module = ast.Module(body=selected, type_ignores=[])
    ns = {'np': np, 'pd': pd}
    ns.update(extra_globals or {})
    exec(compile(module, path, 'exec'), ns)
    return {name: ns[name] for name in names}


@pytest.fixture(scope='module')
def ref_homology():
    return _extract_functions(
        os.path.join(REF_ROOT, 'pavlib', 'call.py'),
        ['left_homology', 'right_homology'])


def test_homology_parity(ref_homology):
    from pav_tpu.call import homology as hom
    from pav_tpu import seqcodec

    rng = np.random.default_rng(7)
    bases = 'ACGT'
    seq = ''.join(rng.choice(list(bases), 3000))
    # Plant a tandem array
    unit = ''.join(rng.choice(list(bases), 6))
    seq = seq[:1000] + unit * 12 + seq[1000 + 72:]
    seq_codes = seqcodec.encode(seq)

    for _ in range(300):
        pos = int(rng.integers(0, len(seq)))
        svlen = int(rng.integers(1, 14))
        if rng.random() < 0.4:
            sv = (unit * 3)[:svlen]
        else:
            sv = ''.join(rng.choice(list(bases), svlen))
        sv_codes = seqcodec.encode(sv)

        want_l = ref_homology['left_homology'](pos, seq, sv)
        got_l = hom.left_homology(pos, seq_codes, sv_codes)
        assert got_l == want_l, f'left mismatch at pos={pos} sv={sv}'

        want_r = ref_homology['right_homology'](pos, seq, sv)
        got_r = hom.right_homology(pos, seq_codes, sv_codes)
        assert got_r == want_r, f'right mismatch at pos={pos} sv={sv}'


@pytest.fixture(scope='module')
def ref_trim():
    # trace_cigar_to_zero/find_cut_sites use TC_* constants from align.py and
    # operate on (len, op-char) tuples.
    align_consts = _extract_functions(
        os.path.join(REF_ROOT, 'pavlib', 'align', 'align.py'),
        ['cigar_str_to_tuples'])
    tc = {name: i for i, name in enumerate(
        ['TC_INDEX', 'TC_OP_LEN', 'TC_OP_CODE', 'TC_DIFF_CUM', 'TC_DIFF',
         'TC_EVENT_CUM', 'TC_EVENT', 'TC_SUB_BP', 'TC_QRY_BP', 'TC_CLIPS_BP',
         'TC_CLIPH_BP'])}
    funcs = _extract_functions(
        os.path.join(REF_ROOT, 'pavlib', 'align', 'trim.py'),
        ['trace_cigar_to_zero', 'find_cut_sites'],
        extra_globals=tc)
    funcs.update(align_consts)
    return funcs


def _random_cigar(rng, n_ops=12):
    ops = []
    for _ in range(n_ops):
        r = rng.random()
        if r < 0.55:
            ops.append((int(rng.integers(5, 120)), '='))
        elif r < 0.75:
            ops.append((int(rng.integers(1, 10)), 'X'))
        elif r < 0.88:
            ops.append((int(rng.integers(1, 40)), 'I'))
        else:
            ops.append((int(rng.integers(1, 40)), 'D'))
    # Start and end aligned
    ops.insert(0, (int(rng.integers(20, 100)), '='))
    ops.append((int(rng.integers(20, 100)), '='))
    return ops


def test_trace_and_cut_site_parity(ref_trim):
    from pav_tpu.align import cigar as cg
    from pav_tpu.align.trim import find_cut_sites, trace_cigar_to_zero

    rng = np.random.default_rng(13)
    rec = pd.Series({'#CHROM': 'c', 'POS': 0})

    for trial in range(60):
        tuples_l = _random_cigar(rng)
        tuples_r = _random_cigar(rng)
        diff_bp = int(rng.integers(10, 250))
        for diff_query in (True, False):
            want_l = ref_trim['trace_cigar_to_zero'](tuples_l, diff_bp, rec, diff_query)
            lens_l, ops_l = cg.from_tuples(tuples_l)
            got_l = trace_cigar_to_zero(lens_l, ops_l, diff_bp, diff_query)
            # Compare numerically (our op codes are ints; map to chars).
            assert len(got_l) == len(want_l), f'trace length trial={trial}'
            for a, b in zip(got_l, want_l):
                assert a[0] == b[0] and a[1] == b[1]
                assert chr(cg.OP_CHARS[a[2]]) == b[2]
                assert a[3:] == tuple(b[3:])

            want_r = ref_trim['trace_cigar_to_zero'](tuples_r, diff_bp, rec, diff_query)
            lens_r, ops_r = cg.from_tuples(tuples_r)
            got_r = trace_cigar_to_zero(lens_r, ops_r, diff_bp, diff_query)

            want_cut = ref_trim['find_cut_sites'](want_l, want_r, diff_bp)
            got_cut = find_cut_sites(got_l, got_r, diff_bp)
            assert got_cut == tuple(want_cut), f'cut sites trial={trial} dq={diff_query}'
