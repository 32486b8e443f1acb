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


def _extract_functions(path, names, extra_globals=None, with_constants=False):
    """Exec selected top-level function defs from a reference source file.
    With with_constants, top-level literal assignments are exec'd too (module
    constants the functions close over)."""
    with open(path) as fh:
        tree = ast.parse(fh.read())
    selected = []
    if with_constants:
        for node in tree.body:
            if (isinstance(node, ast.Assign)
                    and all(isinstance(t, ast.Name) for t in node.targets)):
                try:
                    ast.literal_eval(node.value)
                except (ValueError, TypeError, SyntaxError):
                    continue
                selected.append(node)
    fn_nodes = [node for node in tree.body
                if isinstance(node, (ast.FunctionDef, ast.ClassDef))
                and node.name in names]
    assert len(fn_nodes) == len(names), f'missing defs in {path}'
    selected.extend(fn_nodes)
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
    from pav_tpu.align.trim import cut_candidates, select_cut_pair

    rng = np.random.default_rng(13)
    rec = pd.Series({'#CHROM': 'c', 'POS': 0})

    # Candidate-table column -> reference trace-tuple field index.
    field_map = [('run_len', 1), ('spent', 3), ('gain', 4), ('ev_lo', 5),
                 ('ev_run', 6), ('ref_bp', 7), ('qry_bp', 8), ('sclip', 9),
                 ('hclip', 10)]

    for trial in range(60):
        tuples_l = _random_cigar(rng)
        tuples_r = _random_cigar(rng)
        diff_bp = int(rng.integers(10, 250))
        for diff_query in (True, False):
            want_l = ref_trim['trace_cigar_to_zero'](tuples_l, diff_bp, rec, diff_query)
            lens_l, ops_l = cg.from_tuples(tuples_l)
            got_l = cut_candidates(lens_l, ops_l, diff_bp, diff_query)
            # Candidates must enumerate the same =/X runs with the same
            # accounting the reference trace records.
            assert got_l.size == len(want_l), f'trace length trial={trial}'
            for row, ref_tup in enumerate(want_l):
                assert got_l.run_i[row] == ref_tup[0]
                assert ('X' if got_l.mism[row] else '=') == ref_tup[2]
                for col, fi in field_map:
                    assert getattr(got_l, col)[row] == ref_tup[fi], (
                        f'{col} trial={trial} row={row}')

            want_r = ref_trim['trace_cigar_to_zero'](tuples_r, diff_bp, rec, diff_query)
            lens_r, ops_r = cg.from_tuples(tuples_r)
            got_r = cut_candidates(lens_r, ops_r, diff_bp, diff_query)

            want_cut = ref_trim['find_cut_sites'](want_l, want_r, diff_bp)
            got_cut = select_cut_pair(got_l, got_r, diff_bp)
            assert got_cut == tuple(want_cut), f'cut sites trial={trial} dq={diff_query}'


# --------------------------------------------------------------- trim driver


@pytest.fixture(scope='module')
def ref_trim_driver():
    """The reference's whole trim_alignments driver, AST-extracted with shims
    for its pavlib/svpoplib namespace references (no code copied)."""
    tc = {name: i for i, name in enumerate(
        ['TC_INDEX', 'TC_OP_LEN', 'TC_OP_CODE', 'TC_DIFF_CUM', 'TC_DIFF',
         'TC_EVENT_CUM', 'TC_EVENT', 'TC_SUB_BP', 'TC_QRY_BP', 'TC_CLIPS_BP',
         'TC_CLIPH_BP'])}

    ns_align = _extract_functions(
        os.path.join(REF_ROOT, 'pavlib', 'align', 'align.py'),
        ['cigar_str_to_tuples', 'count_cigar', 'check_record'],
        extra_globals=tc, with_constants=True)
    ns_trim = _extract_functions(
        os.path.join(REF_ROOT, 'pavlib', 'align', 'trim.py'),
        ['trim_alignments', 'trim_alignment_record', 'trace_cigar_to_zero',
         'find_cut_sites'],
        extra_globals=dict(tc, **ns_align))

    # Wire the cross-module attribute references the extracted code makes.
    align_api = types.SimpleNamespace(**ns_align, **ns_trim)
    shims = {
        'pavlib': types.SimpleNamespace(align=align_api),
        'svpoplib': types.SimpleNamespace(
            ref=types.SimpleNamespace(get_df_fai=lambda fai: pd.Series(fai))),
    }
    for fn in list(ns_align.values()) + list(ns_trim.values()):
        fn.__globals__.update(shims)
        fn.__globals__.update(ns_align)
        fn.__globals__.update(ns_trim)
    return ns_trim['trim_alignments']


def _random_align_table(rng, n_contigs=3, recs_per_contig=5):
    """Generate a consistent alignment table with query- and reference-space
    overlaps (CIGAR accounting matches all coordinates)."""
    from pav_tpu.align import cigar as cg

    rows = []
    fai = {}
    index = 0
    for c in range(n_contigs):
        qname = f'q{c}'
        qpos = int(rng.integers(0, 200))
        spans = []
        for k in range(recs_per_contig):
            tuples = _random_cigar(rng, n_ops=int(rng.integers(6, 16)))
            lens, ops = cg.from_tuples(tuples)
            ref_bp = int(lens[np.isin(ops, (cg.EQ, cg.X, cg.D))].sum())
            qry_bp = int(lens[np.isin(ops, (cg.EQ, cg.X, cg.I))].sum())
            spans.append((qpos, qpos + qry_bp, lens, ops, ref_bp, qry_bp))
            # Next record overlaps this one's tail about half the time.
            if rng.random() < 0.6:
                qpos = qpos + qry_bp - int(rng.integers(1, max(qry_bp // 2, 2)))
                qpos = max(qpos, 0)
            else:
                qpos = qpos + qry_bp + int(rng.integers(0, 300))
        qry_len = max(e for _, e, *_ in spans) + int(rng.integers(0, 200))
        fai[qname] = qry_len

        for qpos, qend, lens, ops, ref_bp, qry_bp in spans:
            rev = bool(rng.random() < 0.35)
            clip_l = (qry_len - qend) if rev else qpos
            clip_r = qpos if rev else (qry_len - qend)
            parts = []
            if clip_l:
                parts.append((clip_l, 'H'))
            parts.extend((int(l), chr(cg.OP_CHARS[o])) for l, o in zip(lens, ops))
            if clip_r:
                parts.append((clip_r, 'H'))
            cigar = ''.join(f'{l}{o}' for l, o in parts)
            # Cluster POS so some records overlap in reference space too.
            pos = int(rng.integers(0, 3)) * 1500 + int(rng.integers(0, 800))
            rows.append({
                '#CHROM': f'chr{int(rng.integers(1, 3))}', 'POS': pos,
                'END': pos + ref_bp, 'INDEX': index, 'QRY_ID': qname,
                'QRY_POS': qpos, 'QRY_END': qend, 'QRY_LEN': qry_len,
                'RG': 'NA', 'AO': 'NA', 'MAPQ': 60, 'REV': rev,
                'FLAGS': '0x0000', 'HAP': 'h1', 'CIGAR': cigar,
                'TRIM_REF_L': 0, 'TRIM_REF_R': 0,
                'TRIM_QRY_L': 0, 'TRIM_QRY_R': 0,
            })
            index += 1
    return pd.DataFrame(rows), fai


@pytest.mark.parametrize('mode', ['tig', 'ref', 'both'])
def test_trim_driver_parity(ref_trim_driver, mode):
    """Whole-driver differential test: randomized tables through the
    reference's trim_alignments vs ours; surviving records and every
    coordinate/CIGAR/TRIM field must agree (VERDICT r1 item 2)."""
    from pav_tpu.align.trim import trim_alignments

    cmp_cols = ['INDEX', '#CHROM', 'POS', 'END', 'QRY_ID', 'QRY_POS',
                'QRY_END', 'CIGAR', 'TRIM_REF_L', 'TRIM_REF_R',
                'TRIM_QRY_L', 'TRIM_QRY_R']

    rng = np.random.default_rng(29)
    for trial in range(8):
        df, fai = _random_align_table(rng)
        min_len = int(rng.integers(50, 400))

        want = ref_trim_driver(df.copy(), min_len, fai, mode=mode)
        got = trim_alignments(df.copy(), min_len, fai, mode=mode)

        want_c = want[cmp_cols].sort_values('INDEX').reset_index(drop=True)
        got_c = got[cmp_cols].sort_values('INDEX').reset_index(drop=True)
        assert list(want_c['INDEX']) == list(got_c['INDEX']), (
            f'survivor sets differ: trial={trial} mode={mode}')
        for col in cmp_cols:
            assert (want_c[col].to_numpy() == got_c[col].to_numpy()).all(), (
                f'column {col} differs: trial={trial} mode={mode}')


# ------------------------------------------------------------- cigar caller


@pytest.fixture(scope='module')
def ref_cigar_caller():
    """The reference's whole make_insdel_snv_calls driver, AST-extracted with
    in-memory shims for pysam/Bio (no code copied)."""
    ns_align = _extract_functions(
        os.path.join(REF_ROOT, 'pavlib', 'align', 'align.py'),
        ['cigar_str_to_tuples'], with_constants=True)
    ns_call = _extract_functions(
        os.path.join(REF_ROOT, 'pavlib', 'call.py'),
        ['left_homology', 'right_homology'])

    class FakeFasta:
        store = {}  # {fa_name: {seq_name: str}}

        def __init__(self, name):
            self._name = name

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def fetch(self, seqname):
            return FakeFasta.store[self._name][seqname]

    _RC = {'A': 'T', 'C': 'G', 'G': 'C', 'T': 'A', 'N': 'N'}

    class FakeSeq:
        def __init__(self, s):
            self.s = str(s)

        def reverse_complement(self):
            return FakeSeq(''.join(_RC[b] for b in reversed(self.s)))

        def __str__(self):
            return self.s

    shims = {
        'pysam': types.SimpleNamespace(FastaFile=FakeFasta),
        'Bio': types.SimpleNamespace(Seq=types.SimpleNamespace(Seq=FakeSeq)),
        'pavlib': types.SimpleNamespace(
            align=types.SimpleNamespace(**ns_align),
            call=types.SimpleNamespace(**ns_call)),
        'svpoplib': types.SimpleNamespace(),
    }
    funcs = _extract_functions(
        os.path.join(REF_ROOT, 'pavlib', 'cigarcall.py'),
        ['make_insdel_snv_calls'], extra_globals=shims, with_constants=True)
    return funcs['make_insdel_snv_calls'], FakeFasta


def _planted_alignment(rng, ref_codes, chrom, qry_name, index, rev, ref_off):
    """Make a mutated contig + consistent =X/I/D CIGAR walking it."""
    from pav_tpu import seqcodec

    sub = ref_codes[ref_off:ref_off + 4000]
    cigar = []
    pieces = []
    cur = 0
    tandem = seqcodec.encode('ACG' * 5)
    while cur < len(sub) - 60:
        run = int(rng.integers(20, 120))
        run = min(run, len(sub) - 60 - cur)
        if run <= 0:
            break
        cigar.append(f'{run}=')
        pieces.append(sub[cur:cur + run])
        cur += run
        r = rng.random()
        if r < 0.35:
            n = int(rng.integers(1, 4))
            n = min(n, len(sub) - 50 - cur)
            alt = (sub[cur:cur + n] + 1 + rng.integers(0, 3, n).astype(np.uint8)) % 4
            cigar.append(f'{n}X')
            pieces.append(alt.astype(np.uint8))
            cur += n
        elif r < 0.6:
            n = int(rng.integers(1, 40))
            ins = tandem[:n % 14 + 1] if rng.random() < 0.4 else rng.integers(0, 4, n).astype(np.uint8)
            cigar.append(f'{len(ins)}I')
            pieces.append(ins)
        elif r < 0.85:
            n = int(rng.integers(1, 40))
            n = min(n, len(sub) - 50 - cur)
            cigar.append(f'{n}D')
            cur += n
    tail = len(sub) - cur
    cigar.append(f'{tail}=')
    pieces.append(sub[cur:])
    aligned = np.concatenate(pieces)
    # The stored (forward) contig is the revcomp of the aligned sequence for
    # REV records.
    stored = seqcodec.revcomp(aligned) if rev else aligned
    row = {
        '#CHROM': chrom, 'POS': ref_off, 'END': ref_off + len(sub),
        'INDEX': index, 'QRY_ID': qry_name, 'QRY_POS': 0,
        'QRY_END': len(aligned), 'QRY_LEN': len(aligned), 'MAPQ': 60,
        'REV': rev, 'FLAGS': '0x0000', 'HAP': 'h1',
        'CIGAR': ''.join(cigar),
    }
    return row, stored


def test_cigar_caller_parity(ref_cigar_caller, tmp_path):
    """Whole-driver differential: randomized mutated contigs through the
    reference's make_insdel_snv_calls vs ours (VERDICT r1 item 2)."""
    from pav_tpu import seqcodec
    from pav_tpu.call.cigar_calls import make_insdel_snv_calls
    from pav_tpu.io.fasta import SeqStore

    ref_fn, FakeFasta = ref_cigar_caller
    rng = np.random.default_rng(91)

    ref_codes = {f'chr{i}': np.concatenate([
        # Embed tandem context so left-shift/homology paths fire.
        rng.integers(0, 4, 3000).astype(np.uint8),
        np.tile(seqcodec.encode('ACG'), 40),
        rng.integers(0, 4, 3000).astype(np.uint8)]) for i in (1, 2)}

    rows = []
    tigs = {}
    idx = 0
    for chrom in ('chr1', 'chr2'):
        for k in range(3):
            qry = f'{chrom}_q{k}'
            row, stored = _planted_alignment(
                rng, ref_codes[chrom], chrom, qry, idx,
                rev=bool(k == 1), ref_off=int(rng.integers(0, 1200)))
            rows.append(row)
            tigs[qry] = stored
            idx += 1
    df_align = pd.DataFrame(rows)

    FakeFasta.store['ref.fa'] = {c: seqcodec.decode(s) for c, s in ref_codes.items()}
    FakeFasta.store['tig.fa'] = {q: seqcodec.decode(s) for q, s in tigs.items()}

    want_snv, want_insdel = ref_fn(df_align, 'ref.fa', 'tig.fa', 'h1', version_id=False)
    got_snv, got_insdel = make_insdel_snv_calls(
        df_align, SeqStore(ref_codes), SeqStore(tigs), 'h1', version_ids=False)

    assert want_snv.shape[0] == got_snv.shape[0] > 50
    assert want_insdel.shape[0] == got_insdel.shape[0] > 20
    for col in want_snv.columns:
        assert (want_snv[col].to_numpy() == got_snv[col].to_numpy()).all(), f'SNV col {col}'
    for col in want_insdel.columns:
        assert (want_insdel[col].to_numpy() == got_insdel[col].to_numpy()).all(), f'INSDEL col {col}'


# -------------------------------------------------------------------- depth


@pytest.fixture(scope='module')
def ref_depth():
    return _extract_functions(
        os.path.join(REF_ROOT, 'pavlib', 'align', 'align.py'),
        ['align_bed_to_depth_bed'])['align_bed_to_depth_bed']


def test_depth_parity(ref_depth):
    from pav_tpu.align.table import depth_table

    rng = np.random.default_rng(41)
    for trial in range(20):
        n = int(rng.integers(2, 40))
        chroms = rng.choice(['chr1', 'chr2', 'chr3'], n)
        pos = rng.integers(0, 5000, n)
        ln = rng.integers(1, 3000, n)
        df = pd.DataFrame({
            '#CHROM': chroms, 'POS': pos, 'END': pos + ln,
            'INDEX': np.arange(n), 'QRY_ID': [f'q{i % 5}' for i in range(n)],
        })
        fai = pd.Series({'chr1': 9000, 'chr2': 9000, 'chr3': 9000, 'chr4': 500})
        for use_fai in (True, False):
            want = ref_depth(df.copy(), fai if use_fai else None)
            got = depth_table(df.copy(), fai if use_fai else None)
            want = want.reset_index(drop=True)
            got = got.reset_index(drop=True)
            assert want.shape[0] == got.shape[0], f'trial={trial} fai={use_fai}'
            for col in ['#CHROM', 'POS', 'END', 'DEPTH', 'QRY_ID', 'INDEX']:
                assert (want[col].astype(str).to_numpy()
                        == got[col].astype(str).to_numpy()).all(), (
                    f'depth col {col} trial={trial} fai={use_fai}')


# --------------------------------------------------------------- rl_encoder


def test_rl_encoder_parity():
    from pav_tpu.call.density import rl_encoder

    ref_rl = _extract_functions(
        os.path.join(REF_ROOT, 'pavlib', 'density.py'), ['rl_encoder'])['rl_encoder']

    rng = np.random.default_rng(17)
    for trial in range(30):
        n = int(rng.integers(1, 400))
        states = rng.choice([0, 1, 2], n, p=[0.5, 0.2, 0.3])
        # Non-contiguous INDEX (the srs/condensed index case).
        index = np.sort(rng.choice(np.arange(n * 3), n, replace=False))
        df = pd.DataFrame({'STATE': states, 'INDEX': index})
        want = list(ref_rl(df))
        got = [tuple(t) for t in rl_encoder(df)]
        assert got == want, f'trial={trial}'


# ------------------------------------------------------------- INV density


@pytest.fixture(scope='module')
def ref_density():
    """The reference's srs-sampled/interpolated density engine, AST-extracted
    from scripts/density.py (the version PAV executes as a subprocess:
    pavlib/inv.py:249-288). mp.Pool is shimmed with a serial pool (extracted
    functions can't be pickled into fork workers); threads=1 math is
    identical."""
    import scipy
    import scipy.stats

    class _SerialPool:
        def __init__(self, threads, initializer=None):
            if initializer:
                initializer()

        def map(self, fn, iterable, chunksize=None):
            return [fn(x) for x in iterable]

        def close(self):
            pass

    extra = {
        'scipy': scipy,
        'mp': types.SimpleNamespace(Pool=_SerialPool),
        # Module constants the functions close over (scripts/density.py:38-62;
        # np.asarray defeats the literal extractor).
        'KMER_ORIENTATION_STATE': np.asarray([[-1, 2], [0, 1]]),
        'SAMPLE_INDEX_CHUNK_SIZE': 400,
        'MAX_REF_KMER_COUNT': 100,
        'kernel_dict': None, 'sum_state_fwd': None, 'sum_state_fwdrev': None,
        'sum_state_rev': None, 'df': None, 'density_bandwidth': None,
    }
    funcs = _extract_functions(
        os.path.join(REF_ROOT, 'scripts', 'density.py'),
        ['init_process', 'density_fwd', 'density_fwdrev', 'density_rev',
         'interp_fwd', 'interp_fwdrev', 'interp_rev', 'get_smoothed_density'],
        extra_globals=extra)
    ns = funcs['get_smoothed_density'].__globals__

    def run(tig_mer_stream, ref_kmer_set, k_util, **kw):
        ns.update(
            tig_mer_stream=tig_mer_stream, ref_kmer_set=ref_kmer_set,
            k_util=k_util, threads=1,
            min_informative_kmers=kw.get('min_informative_kmers', 2000),
            density_smooth_factor=kw.get('density_smooth_factor', 1),
            min_state_count=kw.get('min_state_count', 20),
            state_run_smooth=kw.get('state_run_smooth', 20),
            state_run_smooth_delta=kw.get('state_run_smooth_delta', 0.005),
            kernel_dict=None, df=None)
        funcs['get_smoothed_density']()
        return ns['df']

    return run


def _longest_rev_run(df):
    from pav_tpu.call.density import rl_encoder
    runs = [r for r in rl_encoder(df) if r[0] == 2]
    assert runs, 'no REV run found'
    return max(runs, key=lambda r: r[1])


def test_inv_density_decision_parity(ref_density):
    """Differential test of the INV density DECISION chain (VERDICT r2
    missing #2): exact-FFT densities vs the reference's srs-sampled +
    interpolated scheme on randomized inverted regions.

    Pins, per trial:
      * identical informative-k-mer row sets and STATE_MER assignments;
      * density agreement at the srs sample points (both engines evaluate
        the true scaled KDE there);
      * smoothed-STATE disagreement rate < 1% (divergence bound — srs
        interpolation between samples vs exact values);
      * the RLE decision that moves breakpoints — the longest strict-REV
        run — agrees within 2 srs strides (40 k-mers) on both ends, and
        both engines accept it (>= 100-k-mer run, the inv.py criterion).
    """
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from helpers import random_seq

    from pav_tpu import kmer as km, seqcodec
    from pav_tpu.call import density as dens

    k = 31
    ku = km.KmerUtil(k)
    rng = np.random.default_rng(23)

    for inv_len, noise in ((8000, 0.001), (5000, 0.004), (12000, 0.002)):
        ref_codes = random_seq(30000, rng)
        tig = ref_codes.copy()
        lo = 11000
        tig[lo:lo + inv_len] = seqcodec.revcomp(tig[lo:lo + inv_len])
        n_mut = int(noise * len(tig))
        if n_mut:
            pos = rng.choice(len(tig), n_mut, replace=False)
            tig[pos] = (tig[pos] + 1 + rng.integers(0, 3, n_mut).astype(np.uint8)) % 4

        ref_sorted = dens.ref_kmer_set(ref_codes, ku)
        kset = set(int(v) for v in ref_sorted)
        kmers, valid = km.kmer_codes(tig, k)
        idxs = np.nonzero(valid)[0]
        stream = [(int(km_), int(ix)) for km_, ix in zip(kmers[idxs], idxs)]

        df_ref = ref_density(stream, kset, ku)
        df_ours = dens.get_smoothed_density(tig, ref_sorted, ku)

        # Same rows, same per-k-mer states.
        assert np.array_equal(df_ref['INDEX'].to_numpy(),
                              df_ours['INDEX'].to_numpy())
        assert np.array_equal(df_ref['STATE_MER'].to_numpy(),
                              df_ours['STATE_MER'].to_numpy())

        # Densities at the srs sample points: both exact there.
        n_rows = df_ref.shape[0]
        sampled = np.zeros(n_rows, dtype=bool)
        sampled[::20] = True
        sampled[-1] = True
        for col in ('KERN_FWD', 'KERN_FWDREV', 'KERN_REV'):
            a = df_ref[col].to_numpy(dtype=float)[sampled]
            b = df_ours[col].to_numpy(dtype=float)[sampled]
            assert np.nanmax(np.abs(a - b)) < 5e-3, \
                f'{col} sample-point divergence {np.nanmax(np.abs(a - b))}'

        # Smoothed-state divergence bound.
        sa = df_ref['STATE'].to_numpy(dtype=int)
        sb = df_ours['STATE'].to_numpy(dtype=int)
        dis_rate = float((sa != sb).mean())
        assert dis_rate < 0.01, f'STATE disagreement {dis_rate:.4f}'

        # The breakpoint-moving decision: longest strict-REV run.
        ra = _longest_rev_run(df_ref)
        rb = _longest_rev_run(df_ours)
        assert ra[1] >= 100 and rb[1] >= 100        # both accept (inv.py:19-51)
        assert abs(ra[2] - rb[2]) <= 40 and abs(ra[3] - rb[3]) <= 40, \
            f'REV-run breakpoints moved: ref {ra} vs ours {rb}'


# ---------------------------------------------------------- large-SV driver


@pytest.fixture(scope='module')
def ref_lgsv():
    """The reference's whole scan_for_events driver (pavlib/lgsv.py:31-642),
    AST-extracted with shims: FASTA access reads from in-memory dicts,
    pavlib.inv.scan_for_inv is stubbed to None (the INV density chain has its
    own differential test; this pins the alignment-pair CLASSIFICATION,
    gating/rescue, left-shift, homology annotation, and the no-density
    3-record rescue), InvCall is the real extracted class."""
    import sys as _sys

    from pav_tpu import seqcodec
    from pav_tpu.call.variant_id import version_id as our_version_id
    from pav_tpu.kmer import KmerUtil
    from pav_tpu.regions import Region

    # Reference homology + match_bp helpers (dependency-light).
    hom = _extract_functions(
        os.path.join(REF_ROOT, 'pavlib', 'call.py'),
        ['left_homology', 'right_homology'])
    aln = _extract_functions(
        os.path.join(REF_ROOT, 'pavlib', 'align', 'align.py'),
        ['match_bp', 'cigar_str_to_tuples'], with_constants=True)
    inv_funcs = _extract_functions(
        os.path.join(REF_ROOT, 'pavlib', 'inv.py'), ['InvCall'])

    _COMPL = str.maketrans('ACGTacgtNn', 'TGCAtgcaNn')

    def region_seq_fasta(region, fa_store, rev_compl=False):
        if isinstance(region, str):
            seq = fa_store[region]
        else:
            seq = fa_store[region.chrom][region.pos:region.end]
        return seq.translate(_COMPL)[::-1] if rev_compl else seq

    class _Seq:
        def __init__(self, s):
            self.s = str(s)

        def reverse_complement(self):
            return _Seq(self.s.translate(_COMPL)[::-1])

        def __str__(self):
            return self.s

    class _StubAlignLift:
        def __init__(self, df, fai):
            pass

    pavlib_ns = types.SimpleNamespace(
        seq=types.SimpleNamespace(Region=Region,
                                  region_seq_fasta=region_seq_fasta),
        align=types.SimpleNamespace(AlignLift=_StubAlignLift,
                                    match_bp=aln['match_bp']),
        call=types.SimpleNamespace(left_homology=hom['left_homology'],
                                   right_homology=hom['right_homology']),
        inv=types.SimpleNamespace(
            scan_for_inv=lambda *a, **k: None,
            InvCall=inv_funcs['InvCall']),
    )
    # InvCall's __init__ has no external deps; its globals need nothing.

    extra = {
        'pavlib': pavlib_ns,
        'kanapy': types.SimpleNamespace(util=types.SimpleNamespace(
            kmer=types.SimpleNamespace(KmerUtil=KmerUtil))),
        'svpoplib': types.SimpleNamespace(variant=types.SimpleNamespace(
            version_id=our_version_id)),
        'Bio': types.SimpleNamespace(Seq=types.SimpleNamespace(Seq=_Seq)),
        'collections': __import__('collections'),
        'os': os, 'sys': _sys,
    }
    funcs = _extract_functions(
        os.path.join(REF_ROOT, 'pavlib', 'lgsv.py'),
        ['scan_for_events', 'SeqCache'], extra_globals=extra,
        with_constants=True)
    return funcs['scan_for_events']


def _lgsv_case_tables():
    """Planted multi-record contigs: clean DEL, clean INS, dist-prop-gated
    pair, long+confident rescue DEL, reverse-strand DEL, both-gaps INV
    attempt, and a +,-,+ triplet (no-density rescue)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from helpers import random_seq

    from pav_tpu import seqcodec

    rng = np.random.default_rng(41)
    ref = random_seq(200000, rng)
    R = lambda a, b: ref[a:b]

    contigs = {}
    rows = []

    def cig(lead, aligned, tail):
        out = []
        if lead:
            out.append(f'{lead}H')
        out.append(f'{aligned}=')
        if tail:
            out.append(f'{tail}H')
        return ''.join(out)

    def add(chrom, pos, end, qid, qpos, qend, qlen, rev, mapq=60):
        lead = (qlen - qend) if rev else qpos
        tail = qpos if rev else (qlen - qend)
        rows.append({'#CHROM': chrom, 'POS': pos, 'END': end,
                     'INDEX': len(rows), 'QRY_ID': qid, 'QRY_POS': qpos,
                     'QRY_END': qend, 'QRY_LEN': qlen, 'MAPQ': mapq,
                     'REV': rev, 'FLAGS': '0x0010' if rev else '0x0000',
                     'HAP': 'h1', 'CIGAR': cig(lead, end - pos, tail)})

    # A: clean 300 bp DEL.
    contigs['tigA'] = np.concatenate([R(10000, 40000), R(40300, 70000)])
    add('c1', 10000, 40000, 'tigA', 0, 30000, 59700, False)
    add('c1', 40300, 70000, 'tigA', 30000, 59700, 59700, False)
    # B: clean 250 bp INS.
    ins_seq = random_seq(250, rng)
    contigs['tigB'] = np.concatenate([R(80000, 100000), ins_seq, R(100000, 120000)])
    add('c1', 80000, 100000, 'tigB', 0, 20000, 40250, False)
    add('c1', 100000, 120000, 'tigB', 20250, 40250, 40250, False)
    # C: short low-MAPQ flanks + big ref gap -> dist-prop gated, no call.
    contigs['tigC'] = np.concatenate([R(130000, 133000), R(145000, 148000)])
    add('c1', 130000, 133000, 'tigC', 0, 3000, 6000, False, mapq=30)
    add('c1', 145000, 148000, 'tigC', 3000, 6000, 6000, False, mapq=30)
    # D: 100 kb ref gap, but 25 kb MAPQ-60 flanks -> rescue applies, DEL.
    contigs['tigD'] = np.concatenate([R(10000, 35000), R(135000, 160000)])
    add('c1', 10000, 35000, 'tigD', 0, 25000, 50000, False)
    add('c1', 135000, 160000, 'tigD', 25000, 50000, 50000, False)
    # E: reverse-strand contig with a 200 bp DEL.
    concatE = np.concatenate([R(40000, 60000), R(60200, 80000)])
    contigs['tigE'] = seqcodec.revcomp(concatE)
    add('c1', 40000, 60000, 'tigE', 19800, 39800, 39800, True)
    add('c1', 60200, 80000, 'tigE', 0, 19800, 39800, True)
    # F: both gaps >= 50 -> INV attempt (stubbed to None), no call.
    insF = random_seq(500, rng)
    contigs['tigF'] = np.concatenate([R(150000, 170000), insF, R(171000, 190000)])
    add('c1', 150000, 170000, 'tigF', 0, 20000, 39500, False)
    add('c1', 171000, 190000, 'tigF', 20500, 39500, 39500, False)
    # G: +,-,+ triplet, density fails -> no-density rescue on the middle rec.
    contigs['tigG'] = np.concatenate([
        R(100000, 120000), seqcodec.revcomp(R(120100, 125100)), R(125200, 145000)])
    add('c1', 100000, 120000, 'tigG', 0, 20000, 44800, False)
    add('c1', 120100, 125100, 'tigG', 20000, 25000, 44800, True)
    add('c1', 125200, 145000, 'tigG', 25000, 44800, 44800, False)

    df = pd.DataFrame(rows).sort_values(['#CHROM', 'POS', 'END']).reset_index(drop=True)
    return ref, contigs, df


def test_lgsv_driver_parity(ref_lgsv, monkeypatch):
    """Whole-driver differential for the large-SV caller (VERDICT r2 next
    #10): classification, gating + rescue, left-shift, homology columns, and
    the 3-record no-density rescue all match the reference on planted cases."""
    from pav_tpu import seqcodec
    from pav_tpu.call import largesv
    from pav_tpu.io.fasta import SeqStore

    ref, contigs, df = _lgsv_case_tables()

    # Reference side: string stores.
    ref_fa = {'c1': seqcodec.decode(ref)}
    tig_fa = {k: seqcodec.decode(v) for k, v in contigs.items()}
    fai = pd.Series({k: len(v) for k, v in contigs.items()})
    import io
    r_ins, r_del, r_inv = ref_lgsv(
        df.copy(), fai, 'h1', ref_fa, tig_fa, 31, log=io.StringIO())

    # Our side: the real driver with the INV scan stubbed the same way.
    # strict_parity replicates a reference BUG: pavlib/align/align.py match_bp
    # compares char CIGAR ops against int codes and always returns 0, so the
    # reference lgsv caller never left-shifts (LEFT_SHIFT is 0 on every row).
    monkeypatch.setattr(largesv.inv_mod, 'scan_for_inv', lambda *a, **k: None)
    o_ins, o_del, o_inv = largesv.scan_for_events(
        df.copy(), SeqStore({'c1': ref}), SeqStore(contigs), 'h1',
        log=io.StringIO(), version_ids=True, strict_parity=True)

    def compare(a, b, cols):
        assert a.shape[0] == b.shape[0], f'row count {a.shape[0]} != {b.shape[0]}'
        a = a.reset_index(drop=True)
        b = b.reset_index(drop=True)
        for col in cols:
            va = [str(v) for v in a[col]]
            vb = [str(v) for v in b[col]]
            assert va == vb, f'{col}: {va} != {vb}'

    insdel_cols = ['#CHROM', 'POS', 'END', 'ID', 'SVTYPE', 'SVLEN',
                   'QRY_REGION', 'QRY_STRAND', 'CI', 'ALIGN_INDEX',
                   'LEFT_SHIFT', 'HOM_REF', 'HOM_TIG', 'FILTER', 'SEQ']
    compare(r_del, o_del, insdel_cols)
    compare(r_ins, o_ins, insdel_cols)
    compare(r_inv, o_inv, ['#CHROM', 'POS', 'END', 'ID', 'SVTYPE', 'SVLEN',
                           'QRY_REGION', 'QRY_STRAND', 'RGN_REF_INNER',
                           'RGN_QRY_INNER', 'ALIGN_INDEX', 'CALL_SOURCE',
                           'FILTER'])

    # The planted events were actually called.
    assert set(map(int, r_del['SVLEN'])) == {300, 200, 100000}
    assert set(map(int, r_ins['SVLEN'])) == {250}
    assert r_inv.shape[0] == 1 and int(r_inv.iloc[0]['SVLEN']) == 5000
    # Reference-bug documentation: every reference LEFT_SHIFT is 0.
    assert all(int(v) == 0 for v in r_del['LEFT_SHIFT'])
    assert all(int(v) == 0 for v in r_ins['LEFT_SHIFT'])

    # Default mode (no strict_parity) applies the INTENDED left-shift
    # (min(end-matched bases, upstream homology)) — the tigA DEL sits in a
    # 2 bp homology context and shifts by 2.
    d_ins, d_del, _ = largesv.scan_for_events(
        df.copy(), SeqStore({'c1': ref}), SeqStore(contigs), 'h1',
        log=io.StringIO(), version_ids=True)
    row = d_del.loc[d_del['SVLEN'] == 300].iloc[0]
    assert int(row['LEFT_SHIFT']) == 2 and int(row['POS']) == 39998


# --------------------------------------------------------- inv-flag rules


def _extract_rule_run(path, rule_name, extra_globals):
    """Exec a snakefile rule's `run:` block as a function (Snakemake rule
    bodies are plain Python at indent 8; `return` works because Snakemake
    wraps them in a function, reproduced here)."""
    lines = open(path).read().splitlines()
    i = next(i for i, l in enumerate(lines) if l.startswith(f'rule {rule_name}:'))
    j = next(j for j in range(i, len(lines)) if lines[j].strip() == 'run:')
    body = []
    for l in lines[j + 1:]:
        if l.strip() == '':
            body.append('')
        elif l.startswith(' ' * 8):
            body.append(l[8:])
        else:
            break
    code = 'def _rule_run():\n' + '\n'.join('    ' + l for l in body)
    ns = {'np': np, 'pd': pd}
    ns.update(extra_globals)
    exec(compile(code, f'{path}::{rule_name}', 'exec'), ns)
    return ns['_rule_run']


def _extract_snakefile_def(path, name):
    """Source text of a top-level `def` in a snakefile (ast can't parse the
    rule DSL, so scan by indentation)."""
    lines = open(path).read().splitlines()
    i = next(i for i, l in enumerate(lines) if l.startswith(f'def {name}('))
    body = [lines[i]]
    for l in lines[i + 1:]:
        if l.strip() == '' or l.startswith((' ', '\t')):
            body.append(l)
        else:
            break
    return '\n'.join(body)


class _ShimInterval:
    def __init__(self, begin, end, data):
        self.begin, self.end, self.data = begin, end, data


class _ShimIntervalTree:
    """Just enough of intervaltree.IntervalTree for the flag rules:
    tree[a:b] = data; tree[a:b] -> set of intervals overlapping [a, b)."""

    def __init__(self):
        self.items = []

    def __setitem__(self, sl, data):
        self.items.append(_ShimInterval(sl.start, sl.stop, data))

    def __getitem__(self, sl):
        return {iv for iv in self.items
                if iv.begin < sl.stop and iv.end > sl.start}


def _inv_flag_inputs(rng):
    """Randomized clustered insdel + snv call tables (PASS/FAIL mixed)."""
    rows = []
    for i in range(400):
        chrom = 'c' + str(int(rng.integers(1, 3)))
        pos = int(rng.integers(0, 30)) * 1500 + int(rng.integers(0, 400))
        svtype = 'INS' if rng.random() < 0.5 else 'DEL'
        svlen = int(rng.integers(1, 400))
        end = pos + 1 if svtype == 'INS' else pos + svlen
        rows.append({'#CHROM': chrom, 'POS': pos, 'END': end,
                     'ID': f'v{i}', 'SVTYPE': svtype, 'SVLEN': svlen,
                     'FILTER': 'PASS' if rng.random() < 0.9 else 'TRIM'})
    df_insdel = pd.DataFrame(rows).sort_values(['#CHROM', 'POS']).reset_index(drop=True)
    rows = []
    for i in range(2000):
        chrom = 'c' + str(int(rng.integers(1, 3)))
        pos = int(rng.integers(0, 25)) * 1800 + int(rng.integers(0, 900))
        rows.append({'#CHROM': chrom, 'POS': pos, 'END': pos + 1,
                     'ID': f's{i}', 'SVTYPE': 'SNV', 'SVLEN': 1,
                     'FILTER': 'PASS' if rng.random() < 0.95 else 'TRIM'})
    df_snv = pd.DataFrame(rows).sort_values(['#CHROM', 'POS']).reset_index(drop=True)
    return df_insdel, df_snv


def test_inv_flag_rules_parity(tmp_path):
    """Differential for the inversion-flagging rule chain (VERDICT r2 next
    #10): the reference's snakefile rule bodies (insdel matching, SNV/indel
    cluster windows, flag merge + accept + batching) extracted and run
    against our inv_flag functions on randomized call tables.

    Documents a reference BUG replicated for parity: call_inv_cluster sets
    cluster_win_min = params.cluster_win (snakefile:619), so the minimum
    cluster span is the 200 bp window, not the documented 500 bp
    inv_sig_cluster_win_min.
    """
    import collections
    import gzip as _gzip

    from pav_tpu.call import inv_flag

    rng = np.random.default_rng(57)
    df_insdel, df_snv = _inv_flag_inputs(rng)
    snake = os.path.join(REF_ROOT, 'rules', 'call_inv.snakefile')

    get_config = lambda wc, key, default=None: default
    itree = types.SimpleNamespace(IntervalTree=_ShimIntervalTree)

    def run_ref_rule(rule, wildcards, inputs, out_path, extra=None):
        ns = {
            'wildcards': wildcards,
            'input': inputs,
            'output': types.SimpleNamespace(bed=str(out_path)),
            'params': getattr(inputs, '_params', None),
            'get_config': get_config,
            'BATCH_COUNT_DEFAULT': 60,
            'collections': collections,
            'intervaltree': itree,
        }
        ns.update(extra or {})
        _extract_rule_run(snake, rule, ns)()
        return pd.read_csv(out_path, sep='\t')

    # --- insdel matched-cluster rule, both vartypes.
    insdel_path = tmp_path / 'insdel.bed.gz'
    df_insdel.to_csv(insdel_path, sep='\t', index=False, compression='gzip')
    ref_flag = {}
    for vartype in ('sv', 'indel'):
        inputs = types.SimpleNamespace(bed=str(insdel_path))
        inputs._params = types.SimpleNamespace(
            flank_cluster=2, flank_merge=2000, cluster_min_svlen=4)
        out = tmp_path / f'flag_insdel_{vartype}.bed.gz'
        r = run_ref_rule('call_inv_flag_insdel_cluster',
                         types.SimpleNamespace(vartype=vartype), inputs, out)
        # strict_parity replicates the reference's missing final-region
        # flush (call_inv.snakefile:558-594 merge loop drops the last open
        # region of the last chromosome).
        o = inv_flag.flag_insdel_cluster(df_insdel, vartype, strict_parity=True)
        assert r[['#CHROM', 'POS', 'END']].astype(str).values.tolist() == \
            o[['#CHROM', 'POS', 'END']].astype(str).values.tolist(), vartype
        o_fixed = inv_flag.flag_insdel_cluster(df_insdel, vartype)
        assert o_fixed.shape[0] == o.shape[0] + 1   # default keeps the final region
        ref_flag[f'insdel_{vartype}'] = out

    # --- cluster rule (indel + snv). Reference bug: win_min = win.
    for vartype, src in (('indel', df_insdel), ('snv', df_snv)):
        src_path = tmp_path / f'src_{vartype}.bed.gz'
        src.to_csv(src_path, sep='\t', index=False, compression='gzip')
        inputs = types.SimpleNamespace(bed=[str(src_path)])
        inputs._params = types.SimpleNamespace(
            cluster_win=200, cluster_win_min=500,
            cluster_min_snv=20, cluster_min_indel=10)
        out = tmp_path / f'flag_cluster_{vartype}.bed.gz'
        r = run_ref_rule('call_inv_cluster',
                         types.SimpleNamespace(vartype=vartype), inputs, out)
        o = inv_flag.flag_cluster(src, vartype, cluster_win=200,
                                  cluster_win_min=200)   # reference bug
        assert r[['#CHROM', 'POS', 'END', 'COUNT']].astype(str).values.tolist() == \
            o[['#CHROM', 'POS', 'END', 'COUNT']].astype(str).values.tolist(), vartype
        ref_flag[f'cluster_{vartype}'] = out

    # --- merge + accept + batch rule.
    accept_src = _extract_snakefile_def(snake, '_call_inv_accept_flagged_region')
    accept_ns = {'np': np, 'pd': pd}
    exec(compile(accept_src, snake, 'exec'), accept_ns)
    inputs = types.SimpleNamespace(
        bed_insdel_sv=str(ref_flag['insdel_sv']),
        bed_insdel_indel=str(ref_flag['insdel_indel']),
        bed_cluster_indel=str(ref_flag['cluster_indel']),
        bed_cluster_snv=str(ref_flag['cluster_snv']))
    out = tmp_path / 'flagged.bed.gz'
    r = run_ref_rule(
        'call_inv_merge_flagged_loci', types.SimpleNamespace(), inputs, out,
        extra={'_call_inv_accept_flagged_region':
               accept_ns['_call_inv_accept_flagged_region']})

    o = inv_flag.merge_flagged_loci(
        inv_flag.flag_insdel_cluster(df_insdel, 'sv', strict_parity=True),
        inv_flag.flag_insdel_cluster(df_insdel, 'indel', strict_parity=True),
        inv_flag.flag_cluster(df_insdel, 'indel', cluster_win=200,
                              cluster_win_min=200),
        inv_flag.flag_cluster(df_snv, 'snv', cluster_win=200,
                              cluster_win_min=200))

    cols = ['#CHROM', 'POS', 'END', 'ID', 'SVTYPE', 'SVLEN', 'TYPE',
            'COUNT_INDEL', 'COUNT_SNV', 'TRY_INV', 'BATCH']
    assert r.shape[0] == o.shape[0] and r.shape[0] > 5
    for col in cols:
        assert [str(v) for v in r[col]] == [str(v) for v in o[col]], col
