"""WHOLE-STAGE differential parity against the reference implementation.

tests/test_reference_parity.py pins function-level parity (homology kernels,
cut-site search) by AST-extracting single reference functions. This module
goes a level up: it executes the reference's COMPLETE stage entry points —
``pavlib.align.trim.trim_alignments`` (pavlib/align/trim.py:11) and
``pavlib.cigarcall.make_insdel_snv_calls`` (pavlib/cigarcall.py:24) — from
the read-only tree at /root/reference, with its external dependencies
(pysam.FastaFile, Bio.Seq, svpoplib.ref.get_df_fai) replaced by in-memory
stubs, then asserts bit-identical stage outputs against ours on alignment
tables produced by our own aligner over randomized synthetic diploids.

Nothing from the reference is copied into the repo; sources are exec'd at
test time.
"""

import os
import sys
import types

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from helpers import Mutator, random_seq  # noqa: E402

REF_ROOT = '/root/reference'

# In-memory registries behind the pysam/svpoplib stubs: "filenames" are keys.
_FA_REGISTRY = {}
_FAI_REGISTRY = {}

_COMP = str.maketrans('ACGTacgtN', 'TGCAtgcaN')


def _exec_ref_module(relpath, mod_name, package=None):
    mod = types.ModuleType(mod_name)
    mod.__package__ = package or mod_name.rpartition('.')[0]
    mod.__file__ = os.path.join(REF_ROOT, relpath)
    with open(mod.__file__) as fh:
        src = fh.read()
    sys.modules[mod_name] = mod
    exec(compile(src, mod.__file__, 'exec'), mod.__dict__)
    return mod


@pytest.fixture(scope='module')
def ref_stage_env():
    """Reference trim + cigarcall modules, exec'd with stubbed externals."""
    saved = {name: sys.modules.get(name) for name in (
        'pysam', 'Bio', 'Bio.Seq', 'svpoplib', 'svpoplib.ref',
        'svpoplib.variant', 'pavlib', 'pavlib.seq', 'pavlib.align',
        'pavlib.align.align', 'pavlib.align.trim', 'pavlib.call',
        'pavlib.cigarcall')}
    try:
        # --- pysam stub: FastaFile over the in-memory registry.
        pysam_stub = types.ModuleType('pysam')

        class FastaFile:
            def __init__(self, name):
                self._seqs = _FA_REGISTRY[name]

            def fetch(self, name, start=None, end=None):
                s = self._seqs[str(name)]
                return s[start:end] if start is not None or end is not None else s

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

            def close(self):
                pass

        pysam_stub.FastaFile = FastaFile
        sys.modules['pysam'] = pysam_stub

        # --- Bio stub: Seq with reverse_complement (cigarcall.py:70).
        bio_stub = types.ModuleType('Bio')
        bio_seq = types.ModuleType('Bio.Seq')

        class Seq(str):
            def reverse_complement(self):
                return Seq(self.translate(_COMP)[::-1])

        bio_seq.Seq = Seq
        bio_stub.Seq = bio_seq
        sys.modules['Bio'] = bio_stub
        sys.modules['Bio.Seq'] = bio_seq

        # --- svpoplib stub: get_df_fai from the registry; version_id unused
        # (stages run with version_id=False) and guards against silent use.
        svpop = types.ModuleType('svpoplib')
        svpop.ref = types.ModuleType('svpoplib.ref')
        svpop.ref.get_df_fai = lambda path: _FAI_REGISTRY[path]

        def _no_version_id(*a, **k):
            raise AssertionError('version_id must not run (version_id=False)')

        svpop.variant = types.ModuleType('svpoplib.variant')
        svpop.variant.version_id = _no_version_id
        sys.modules['svpoplib'] = svpop
        sys.modules['svpoplib.ref'] = svpop.ref
        sys.modules['svpoplib.variant'] = svpop.variant

        # --- pavlib package skeleton.
        pavlib_pkg = types.ModuleType('pavlib')
        pavlib_pkg.__path__ = []
        seq_stub = types.ModuleType('pavlib.seq')  # align.py imports it;
        sys.modules['pavlib'] = pavlib_pkg         # trim/cigarcall never call it
        sys.modules['pavlib.seq'] = seq_stub
        pavlib_pkg.seq = seq_stub

        align_pkg = types.ModuleType('pavlib.align')
        align_pkg.__path__ = []
        sys.modules['pavlib.align'] = align_pkg
        pavlib_pkg.align = align_pkg

        align_mod = _exec_ref_module('pavlib/align/align.py',
                                     'pavlib.align.align')
        for name in dir(align_mod):
            if not name.startswith('_'):
                setattr(align_pkg, name, getattr(align_mod, name))
        align_pkg.align = align_mod

        trim_mod = _exec_ref_module('pavlib/align/trim.py',
                                    'pavlib.align.trim',
                                    package='pavlib.align')
        for name in ('trim_alignments', 'trim_alignment_record',
                     'find_cut_sites', 'trace_cigar_to_zero'):
            setattr(align_pkg, name, getattr(trim_mod, name))

        # pavlib.call: only the homology kernels are consumed by cigarcall;
        # extract exactly those (call.py itself needs intervaltree).
        from test_reference_parity import _extract_functions
        call_stub = types.ModuleType('pavlib.call')
        call_fns = _extract_functions(
            os.path.join(REF_ROOT, 'pavlib', 'call.py'),
            ['left_homology', 'right_homology'])
        call_stub.left_homology = call_fns['left_homology']
        call_stub.right_homology = call_fns['right_homology']
        sys.modules['pavlib.call'] = call_stub
        pavlib_pkg.call = call_stub

        cigarcall_mod = _exec_ref_module('pavlib/cigarcall.py',
                                         'pavlib.cigarcall',
                                         package='pavlib')
        pavlib_pkg.cigarcall = cigarcall_mod

        yield {'trim': trim_mod, 'cigarcall': cigarcall_mod}
    finally:
        for name, mod in saved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod


# ---------------------------------------------------------------- inputs


def _synth_align_table(seed, ref_len=400000, n_contigs=3):
    """Randomized diploid-like contigs aligned by OUR aligner -> (align table
    with TRIM_* zeroed, ref SeqStore, qry SeqStore)."""
    from pav_tpu import seqcodec
    from pav_tpu.align.aligner.core import Aligner
    from pav_tpu.align.table import TRIM_COLUMNS, sort_align_table
    from pav_tpu.io.fasta import SeqStore

    rng = np.random.default_rng(seed)
    ref = random_seq(ref_len, rng)
    tigs = {}
    for ci in range(n_contigs):
        lo = int(rng.integers(0, ref_len // 2))
        hi = lo + int(rng.integers(ref_len // 4, ref_len // 2))
        mut = Mutator(ref[lo:hi].copy())
        pos = 500
        while pos < (hi - lo) - 6000:
            r = rng.random()
            if r < 0.7:
                mut.snv(pos, rng=rng)
            elif r < 0.9:
                ln = int(rng.integers(1, 30))
                if rng.random() < 0.5:
                    mut.ins(pos, random_seq(ln, rng))
                else:
                    mut.dele(pos, ln)
            elif r < 0.97:
                ln = int(rng.integers(50, 900))
                if rng.random() < 0.5:
                    mut.ins(pos, random_seq(ln, rng))
                else:
                    mut.dele(pos, ln)
            else:
                mut.inv(pos, int(rng.integers(2000, 5000)))
            pos = max(pos + int(rng.integers(400, 1200)), mut.cursor + 100)
        codes = mut.finish()
        if rng.random() < 0.3:
            codes = seqcodec.revcomp(codes)
        tigs[f'tig{ci}'] = codes

    ref_store = SeqStore({'chr1': ref})
    qry_store = SeqStore(tigs)
    aligner = Aligner(ref_store, {'aligner_min_chain_score': 500})
    df = aligner.align_store(qry_store, 'h1')
    df = sort_align_table(df)
    df['INDEX'] = np.arange(df.shape[0])
    for col in TRIM_COLUMNS:
        df[col] = 0
    return df, ref_store, qry_store


def _norm_align(df):
    """Comparison view of an alignment table: canonical dtypes + order."""
    out = df.reset_index(drop=True).copy()
    for col in ('POS', 'END', 'QRY_POS', 'QRY_END', 'QRY_LEN',
                'TRIM_REF_L', 'TRIM_REF_R', 'TRIM_QRY_L', 'TRIM_QRY_R'):
        out[col] = out[col].astype(np.int64)
    out['REV'] = out['REV'].astype(bool)
    out['#CHROM'] = out['#CHROM'].astype(str)
    out['QRY_ID'] = out['QRY_ID'].astype(str)
    out['CIGAR'] = out['CIGAR'].astype(str)
    cols = ['#CHROM', 'POS', 'END', 'QRY_ID', 'QRY_POS', 'QRY_END',
            'QRY_LEN', 'REV', 'CIGAR',
            'TRIM_REF_L', 'TRIM_REF_R', 'TRIM_QRY_L', 'TRIM_QRY_R']
    return out[cols].sort_values(
        ['#CHROM', 'POS', 'END', 'QRY_ID', 'QRY_POS']).reset_index(drop=True)


@pytest.mark.parametrize('seed', [3, 17])
@pytest.mark.parametrize('mode', ['tig', 'both'])
def test_trim_alignments_stage_parity(ref_stage_env, seed, mode):
    """Reference trim_alignments vs ours: bit-identical trimmed tables
    (coordinates, rebuilt CIGARs, TRIM_* accounting, dropped records) on
    our aligner's output over randomized mutated contigs."""
    from pav_tpu.align.trim import trim_alignments as our_trim

    df, ref_store, qry_store = _synth_align_table(seed)
    if df.shape[0] < 3:
        pytest.skip('degenerate alignment table')
    fai = qry_store.fai()
    fai_series = pd.Series({k: int(v) for k, v in fai.items()})
    _FAI_REGISTRY['tig.fai'] = fai_series

    ours = our_trim(df.copy(), 1000, fai, mode=mode)
    theirs = ref_stage_env['trim'].trim_alignments(
        df.copy(), 1000, 'tig.fai', mode=mode)

    a, b = _norm_align(ours), _norm_align(theirs)
    assert a.shape[0] == b.shape[0], (
        f'row count differs: ours={a.shape[0]} ref={b.shape[0]}')
    for col in a.columns:
        assert a[col].equals(b[col]), f'column {col} differs (seed={seed})'


def _norm_calls(df, cols):
    out = df.reset_index(drop=True).copy()
    for col in cols:
        if col in ('POS', 'END', 'SVLEN'):
            out[col] = out[col].astype(np.int64)
        else:
            out[col] = out[col].astype(str)
    return out[list(cols)].sort_values(
        ['#CHROM', 'POS', 'ID']).reset_index(drop=True)


@pytest.mark.parametrize('seed', [5])
def test_cigar_calls_stage_parity(ref_stage_env, seed):
    """Reference make_insdel_snv_calls vs ours: identical SNV and INS/DEL
    call tables (positions, IDs, sequences, homology annotations) from the
    same alignment table + sequences."""
    from pav_tpu import seqcodec
    from pav_tpu.call.cigar_calls import make_insdel_snv_calls as our_calls

    df, ref_store, qry_store = _synth_align_table(seed)
    if df.shape[0] == 0:
        pytest.skip('degenerate alignment table')

    _FA_REGISTRY['ref.fa'] = {
        name: seqcodec.decode(ref_store.get(name))
        for name in ref_store.names()}
    _FA_REGISTRY['tig.fa'] = {
        name: seqcodec.decode(qry_store.get(name))
        for name in qry_store.names()}

    our_snv, our_insdel = our_calls(df, ref_store, qry_store, 'h1',
                                    version_ids=False)
    # Reference returns (df_snv, df_insdel) — cigarcall.py:362 (its own
    # docstring states the opposite order).
    ref_snv, ref_insdel = ref_stage_env['cigarcall'].make_insdel_snv_calls(
        df, 'ref.fa', 'tig.fa', 'h1', version_id=False)

    snv_cols = ('#CHROM', 'POS', 'END', 'ID', 'REF', 'ALT',
                'QRY_REGION', 'QRY_STRAND')
    a = _norm_calls(our_snv, snv_cols)
    b = _norm_calls(ref_snv, snv_cols)
    assert a.shape[0] == b.shape[0], (
        f'SNV count differs: ours={a.shape[0]} ref={b.shape[0]}')
    for col in snv_cols:
        assert a[col].equals(b[col]), f'SNV column {col} differs'

    ind_cols = ('#CHROM', 'POS', 'END', 'ID', 'SVTYPE', 'SVLEN', 'SEQ',
                'QRY_REGION', 'QRY_STRAND')
    a = _norm_calls(our_insdel, ind_cols)
    b = _norm_calls(ref_insdel, ind_cols)
    assert a.shape[0] == b.shape[0], (
        f'INS/DEL count differs: ours={a.shape[0]} ref={b.shape[0]}')
    for col in ind_cols:
        assert a[col].equals(b[col]), f'INS/DEL column {col} differs'
