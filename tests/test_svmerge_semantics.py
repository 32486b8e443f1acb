"""svmerge semantics fixtures: every documented behavior of the reference's
haplotype merger encoded as a test (VERDICT r1 item 10).

Sources of truth: /root/reference/HAP_MERGING.md:7-28 (strategy grammar, ro /
szro parameter meanings, nrsnv exactness), /root/reference/CHANGES.md:142-148
(match=0.8 identity, alignment params, 500kb alignment cap with Jaccard k=9
beyond), /root/reference/pavlib/call.py:736-770 (merge_TYPE config hierarchy).
Remaining ambiguities are documented in pav_tpu/call/merge.py's module
docstring ledger.
"""

import numpy as np
import pandas as pd
import pytest

from pav_tpu.call import merge as svmerge
from pav_tpu.call.integrate import get_merge_params

NR = 'nr::ro(0.5):szro(0.5,200,2):match'


def _var(chrom, pos, end, vid, svtype, svlen, seq='', **kw):
    row = {'#CHROM': chrom, 'POS': pos, 'END': end, 'ID': vid,
           'SVTYPE': svtype, 'SVLEN': svlen, 'SEQ': seq}
    row.update(kw)
    return row


def _merge2(v1, v2, strategy=NR):
    out = svmerge.merge_variants(
        [pd.DataFrame([v1]), pd.DataFrame([v2])], ['h1', 'h2'], strategy)
    return out


def _merged(out):
    return out.shape[0] == 1 and out.iloc[0]['MERGE_SAMPLES'] == 'h1,h2'


# ------------------------------------------------------------------ ro stage


def test_ro_boundary_inclusive():
    """ro(0.5): reciprocal overlap of exactly 50% merges; just under does not
    (HAP_MERGING.md: 'Overlap proportion (0.5 is 50% RO)')."""
    seq = 'A' * 1000
    a = _var('c', 10000, 11000, 'a', 'DEL', 1000, seq)
    # 50% overlap of equal-length DELs: shift by 500 -> inter 500 / max 1000.
    # Offset 500 also passes no szro stage (dist cap 200), so ro is the
    # only merging stage in play.
    b = _var('c', 10500, 11500, 'b', 'DEL', 1000, seq)
    assert _merged(_merge2(a, b))
    out = _merge2(a, b)
    assert out.iloc[0]['MERGE_RO'].split(',')[1] == '0.5'

    c = _var('c', 10501, 11501, 'cc', 'DEL', 1000, seq)  # 499/1000 < 0.5
    assert not _merged(_merge2(a, c))


def test_ro_is_reciprocal():
    """RO uses the larger span as denominator (reciprocal overlap): a small
    DEL inside a big one has high overlap w.r.t. itself but low RO."""
    a = _var('c', 10000, 12000, 'a', 'DEL', 2000, 'A' * 2000)
    b = _var('c', 10000, 10900, 'b', 'DEL', 900, 'A' * 900)  # 900/2000 < 0.5
    assert not _merged(_merge2(a, b, 'nr::ro(0.5)'))
    c = _var('c', 10000, 11000, 'cc', 'DEL', 1000, 'A' * 1000)  # 1000/2000 = 0.5
    assert _merged(_merge2(a, c, 'nr::ro(0.5)'))


def test_ro_ins_uses_notional_span():
    """Insertions (END = POS+1 in BED form) overlap by their notional
    [POS, POS+SVLEN) span for RO purposes."""
    seq = 'ACGT' * 250
    a = _var('c', 10000, 10001, 'a', 'INS', 1000, seq)
    b = _var('c', 10400, 10401, 'b', 'INS', 1000, seq)  # inter 600/1000
    assert _merged(_merge2(a, b, 'nr::ro(0.5)'))
    c = _var('c', 10600, 10601, 'cc', 'INS', 1000, seq)  # inter 400/1000
    assert not _merged(_merge2(a, c, 'nr::ro(0.5)'))


# ---------------------------------------------------------------- szro stage


def test_szro_size_proportion_boundary():
    """szro(0.5,...): min(sz)/max(sz) >= 0.5 required
    (HAP_MERGING.md: 'Size proportion (like RO if variants were right on top
    of each other)')."""
    a = _var('c', 10000, 10001, 'a', 'INS', 1000, 'A' * 1000)
    b = _var('c', 10050, 10051, 'b', 'INS', 500, 'A' * 500)    # 500/1000 = 0.5
    assert _merged(_merge2(a, b, 'nr::szro(0.5,200,2)'))
    c = _var('c', 10050, 10051, 'cc', 'INS', 499, 'A' * 499)   # 499/1000 < 0.5
    assert not _merged(_merge2(a, c, 'nr::szro(0.5,200,2)'))


def test_szro_offset_is_min_of_pos_end_diff():
    """szro offset = min(|dPOS|, |dEND|)
    (HAP_MERGING.md: 'Maximum distance (minimum of start positon difference
    or end position difference)')."""
    # DELs sharing their END but starting 600 apart: |dPOS|=600, |dEND|=0.
    a = _var('c', 10000, 11200, 'a', 'DEL', 1200, 'A' * 1200)
    b = _var('c', 10600, 11200, 'b', 'DEL', 600, 'A' * 600)
    # szro = 600/1200 = 0.5 passes; offset = min(600, 0) = 0 passes.
    # (RO = 600/1200 = 0.5 would also pass ro; use szro-only strategy.)
    assert _merged(_merge2(a, b, 'nr::szro(0.5,200,2)'))


def test_szro_distance_cap():
    """szro(.,200,.): offset > 200 does not merge even with equal sizes."""
    seq = 'ACGT' * 250
    a = _var('c', 10000, 10001, 'a', 'INS', 1000, seq)
    b = _var('c', 10200, 10201, 'b', 'INS', 1000, seq)   # offset 200 = cap
    assert _merged(_merge2(a, b, 'nr::szro(0.5,200,2)'))
    c = _var('c', 10201, 10202, 'cc', 'INS', 1000, seq)  # offset 201 > cap
    assert not _merged(_merge2(a, c, 'nr::szro(0.5,200,2)'))


def test_szro_offset_proportion_cap():
    """szro(.,.,2): offset may not exceed 2x the variant size
    (HAP_MERGING.md: 'e.g. 2 means offset may not be more than 2x variant
    size') — small variants get a tighter cap than the absolute distance."""
    seq = 'ACGT' * 15
    a = _var('c', 10000, 10001, 'a', 'INS', 60, seq)
    b = _var('c', 10120, 10121, 'b', 'INS', 60, seq)   # offset 120 = 2*60
    assert _merged(_merge2(a, b, 'nr::szro(0.5,200,2)'))
    c = _var('c', 10121, 10122, 'cc', 'INS', 60, seq)  # offset 121 > 2*60
    assert not _merged(_merge2(a, c, 'nr::szro(0.5,200,2)'))


# --------------------------------------------------------------- match stage


def test_match_80pct_identity():
    """match: sequences must be >= 80% identical (CHANGES.md 1.2.0)."""
    rng = np.random.default_rng(3)
    base = ''.join('ACGT'[i] for i in rng.integers(0, 4, 400))
    # ~10% mismatches -> ~90% identity: merges.
    near = list(base)
    for i in range(0, 400, 10):
        near[i] = 'A' if near[i] != 'A' else 'C'
    near = ''.join(near)
    # ~30% mismatches -> ~70% identity: rejected by match.
    far = list(base)
    for i in range(0, 400, 3):
        far[i] = 'A' if far[i] != 'A' else 'C'
    far = ''.join(far)

    a = _var('c', 10000, 10001, 'a', 'INS', 400, base)
    b = _var('c', 10010, 10011, 'b', 'INS', 400, near)
    c = _var('c', 10010, 10011, 'cc', 'INS', 400, far)
    assert _merged(_merge2(a, b))
    assert not _merged(_merge2(a, c))
    # Without the match directive, position/size suffice for both.
    assert _merged(_merge2(a, c, 'nr::ro(0.5):szro(0.5,200,2)'))


def test_match_long_sequences_jaccard():
    """Beyond the alignment cap, identity falls back to k-mer (k=9) Jaccard
    (CHANGES.md: 'align up to 500,000 bp (Jaccard similarity if larger),
    Jaccard k-mer size 9'); identical long sequences still merge, shuffled
    content does not."""
    rng = np.random.default_rng(5)
    long_seq = ''.join('ACGT'[i] for i in rng.integers(0, 4, 4000))
    other = ''.join('ACGT'[i] for i in rng.integers(0, 4, 4000))
    a = _var('c', 10000, 10001, 'a', 'INS', 4000, long_seq)
    b = _var('c', 10020, 10021, 'b', 'INS', 4000, long_seq)
    c = _var('c', 10020, 10021, 'cc', 'INS', 4000, other)
    assert _merged(_merge2(a, b))
    assert not _merged(_merge2(a, c))


# -------------------------------------------------------------------- nrsnv


def test_nrsnv_exact_semantics():
    """nrsnv::exact: REF and ALT must match and position must be exact
    (HAP_MERGING.md: '"nrsnv" enforces REF and ALT matches, and "exact"
    means exact position only')."""
    a = _var('c', 100, 101, 'a', 'SNV', 1, REF='A', ALT='G')
    same = _var('c', 100, 101, 'b', 'SNV', 1, REF='A', ALT='G')
    off1 = _var('c', 101, 102, 'o', 'SNV', 1, REF='A', ALT='G')
    alt2 = _var('c', 100, 101, 'x', 'SNV', 1, REF='A', ALT='T')
    assert _merged(_merge2(a, same, 'nrsnv::exact'))
    assert not _merged(_merge2(a, off1, 'nrsnv::exact'))
    assert not _merged(_merge2(a, alt2, 'nrsnv::exact'))


# ------------------------------------------------------- nonredundant rules


def test_per_source_single_claim():
    """One lead absorbs at most one variant per later source; the second
    matching variant of that source becomes its own lead (nonredundant
    merging: each source contributes each site once)."""
    seq = 'ACGT' * 100
    h1 = pd.DataFrame([_var('c', 10000, 10001, 'lead', 'INS', 400, seq)])
    h2 = pd.DataFrame([
        _var('c', 10005, 10006, 'near1', 'INS', 400, seq),
        _var('c', 10010, 10011, 'near2', 'INS', 400, seq),
    ])
    out = svmerge.merge_variants([h1, h2], ['h1', 'h2'], NR)
    assert out.shape[0] == 2
    lead = out.loc[out['ID'] == 'lead'].iloc[0]
    assert lead['MERGE_SAMPLES'] == 'h1,h2'
    assert len(lead['MERGE_VARIANTS'].split(',')) == 2
    # The unclaimed h2 variant survives as its own lead.
    assert (out['MERGE_SRC'] == 'h2').sum() == 1


def test_lead_priority_first_source():
    """Leads come from sources in order: a merged pair is reported at the
    first source's coordinates with MERGE_SRC = first source."""
    seq = 'ACGT' * 100
    a = _var('c', 10020, 10021, 'first', 'INS', 400, seq)
    b = _var('c', 10000, 10001, 'second', 'INS', 400, seq)
    out = _merge2(a, b)
    assert _merged(out)
    assert out.iloc[0]['ID'] == 'first' and out.iloc[0]['MERGE_SRC'] == 'h1'
    assert out.iloc[0]['POS'] == 10020


def test_svtype_never_cross_merges():
    """INS never merges with DEL regardless of position/size."""
    a = _var('c', 10000, 10001, 'a', 'INS', 500, 'A' * 500)
    b = _var('c', 10000, 10500, 'b', 'DEL', 500, 'A' * 500)
    assert not _merged(_merge2(a, b))


def test_empty_sources():
    out = svmerge.merge_variants(
        [pd.DataFrame([_var('c', 1, 2, 'a', 'INS', 100, 'A' * 100)]),
         pd.DataFrame([], columns=['#CHROM', 'POS', 'END', 'ID', 'SVTYPE',
                                   'SVLEN', 'SEQ'])],
        ['h1', 'h2'], NR)
    assert out.shape[0] == 1 and out.iloc[0]['MERGE_SAMPLES'] == 'h1'


# -------------------------------------------------------- config hierarchy


def test_merge_param_hierarchy():
    """merge_TYPE config keys resolve per the reference hierarchy
    (pavlib/call.py:753-764): merge_<svtype> > merge_insdel > merge_insdelinv
    > built-in default; SNV only honors merge_snv."""
    assert get_merge_params('ins', {'merge_ins': 'X'}) == 'X'
    assert get_merge_params('ins', {'merge_insdel': 'Y'}) == 'Y'
    assert get_merge_params('del', {'merge_insdelinv': 'Z'}) == 'Z'
    assert get_merge_params('inv', {'merge_insdel': 'Y'}) == 'Y'
    assert get_merge_params('ins', {'merge_ins': 'X', 'merge_insdel': 'Y'}) == 'X'
    assert get_merge_params('snv', {'merge_insdel': 'Y'}) == 'nrsnv::exact'
    assert get_merge_params('snv', {'merge_snv': 'S'}) == 'S'
    assert get_merge_params('ins', {}) == 'nr::ro(0.5):szro(0.5,200,2):match'


# ------------------------------------------- columnar vs sequential engine


def test_nr_columnar_vs_sequential():
    """Randomized differential: the columnar nr engine (_merge_nr_leads)
    reproduces the sequential greedy reference exactly — same leads, same
    support attachment (sample/id/metrics), same claim resolution — on
    clustered random variants across 3 sources (VERDICT r2 next #3)."""
    import numpy as np
    from pav_tpu.call.merge import (_match_arrays, _merge_nr_leads,
                                    _source_arrays, parse_strategy)
    from pav_tpu.util import IntervalIndex

    rng = np.random.default_rng(17)
    strat = parse_strategy('nr::ro(0.5):szro(0.5,200,2):match')

    def random_source(n, seed):
        r = np.random.default_rng(seed)
        rows = []
        for i in range(n):
            # Cluster positions so sources collide often.
            pos = int(r.integers(0, 40)) * 500 + int(r.integers(0, 60))
            svtype = ['INS', 'DEL', 'INV'][int(r.integers(0, 3))]
            svlen = int(r.integers(1, 400))
            end = pos + 1 if svtype == 'INS' else pos + svlen
            seq = ''.join('ACGT'[b] for b in r.integers(0, 4, svlen))
            chrom = 'c' + str(int(r.integers(1, 3)))
            rows.append({'#CHROM': chrom, 'POS': pos, 'END': end,
                         'ID': f's{seed}_{i}', 'SVTYPE': svtype,
                         'SVLEN': svlen, 'SEQ': seq})
        return pd.DataFrame(rows)

    def sequential_reference(arrs, names, strat):
        """The pre-vectorization per-row greedy loop, verbatim semantics."""
        leads, support = [], []
        for si, (a, name) in enumerate(zip(arrs, names)):
            n = len(a['pos'])
            if n == 0:
                continue
            if not leads:
                for ri in range(n):
                    leads.append((si, ri))
                    support.append([(name, a['id'][ri], 1.0, 0, 1.0, 0.0, 1.0)])
                continue
            by_chrom = {}
            chrom_l = np.array([arrs[s]['chrom'][r] for s, r in leads])
            pos_l = np.array([arrs[s]['pos'][r] for s, r in leads])
            end_l = np.array([arrs[s]['end'][r] for s, r in leads])
            for chrom in set(chrom_l.tolist()):
                m = np.nonzero(chrom_l == chrom)[0]
                by_chrom[chrom] = (IntervalIndex(pos_l[m] - 1000, end_l[m] + 1000),
                                   m)
            claimed = set()
            for ri in range(n):
                chrom = a['chrom'][ri]
                hit = None
                if chrom in by_chrom:
                    iidx, lead_ids = by_chrom[chrom]
                    cand = iidx.overlap_indices(int(a['pos_n'][ri]) - 1000,
                                                int(a['end_n'][ri]) + 1000)
                    best = None
                    for c in cand:
                        li = int(lead_ids[c])
                        if li in claimed:
                            continue
                        lsi, lri = leads[li]
                        m = _match_arrays(arrs[lsi], lri, arrs[si], ri, strat)
                        if m is None:
                            continue
                        key = (m[0], -m[1])
                        if best is None or key > best[0]:
                            best = (key, li, m)
                    if best is not None:
                        hit = (best[1], best[2])
                if hit is None:
                    leads.append((si, ri))
                    support.append([(name, a['id'][ri], 1.0, 0, 1.0, 0.0, 1.0)])
                else:
                    li, (ro, off, szro, offsz, mv) = hit
                    claimed.add(li)
                    support[li].append((name, a['id'][ri], ro, off, szro,
                                        offsz, mv))
        return leads, support

    for trial in range(4):
        dfs = [random_source(120, 100 * trial + s) for s in range(3)]
        names = ['h1', 'h2', 'h3']
        arrs_a = [_source_arrays(df, strat) for df in dfs]
        arrs_b = [_source_arrays(df, strat) for df in dfs]
        leads_v, sup_v = _merge_nr_leads(arrs_a, names, strat)
        leads_s, sup_s = sequential_reference(arrs_b, names, strat)
        assert leads_v == leads_s
        assert len(sup_v) == len(sup_s)
        for sv, ss in zip(sup_v, sup_s):
            assert len(sv) == len(ss)
            for tv, ts in zip(sv, ss):
                assert tv[0] == ts[0] and tv[1] == ts[1]
                assert abs(tv[2] - ts[2]) < 1e-9 and int(tv[3]) == int(ts[3])
                assert abs(tv[4] - ts[4]) < 1e-9 and abs(tv[5] - ts[5]) < 1e-9
                same_nan = (np.isnan(tv[6]) and np.isnan(ts[6]))
                assert same_nan or abs(tv[6] - ts[6]) < 1e-9
