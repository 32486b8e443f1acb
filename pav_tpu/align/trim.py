"""Alignment trimming: resolve redundantly-mapped bases between overlapping
alignment records, in query space then reference space.

Algorithm parity with the reference (pavlib/align/trim.py:11-917): per-pair
optimal cut-site search over CIGAR traces maximizing removed events (I/D/X)
with left-alignment tie-breaks, containment drops, and min-length drops. The
trace is a prefix-scan over CIGAR runs (ops, not bases), so cost is O(#ops),
and the pair loops touch only same-contig / same-chromosome record groups.

Tiers produced by the pipeline: trim-none / trim-qry ("tig") / trim-qryref
("tigref") — reference rules/align.snakefile:54-97.
"""

import numpy as np

from . import cigar as cg
from .table import check_table, sort_align_table

# Trace tuple fields (reference: pavlib/align/align.py:34-44)
TC_INDEX, TC_OP_LEN, TC_OP_CODE, TC_DIFF_CUM, TC_DIFF, TC_EVENT_CUM, TC_EVENT, \
    TC_SUB_BP, TC_QRY_BP, TC_CLIPS_BP, TC_CLIPH_BP = range(11)


def trace_cigar_to_zero(lens, ops, diff_bp, diff_query):
    """Walk CIGAR ops from the head until diff_bp bases are consumed, recording
    a cut-candidate trace at every =/X op (reference: trim.py:779-917)."""
    trace = []
    diff_cum = 0
    event_cum = 0
    sub_bp = 0
    qry_bp = 0
    clip_s = 0
    clip_h = 0
    last_no_match = False

    for index in range(len(ops)):
        op_len = int(lens[index])
        op = int(ops[index])

        if op == cg.EQ:
            event, sub, qry = 0, op_len, op_len
            last_no_match = False
        elif op == cg.X:
            event, sub, qry = op_len, op_len, op_len
            last_no_match = True
        elif op == cg.I:
            event, sub, qry = 1, 0, op_len
            last_no_match = True
        elif op == cg.D:
            event, sub, qry = 1, op_len, 0
            last_no_match = True
        elif op == cg.S:
            event, sub, qry = 0, 0, 0
            clip_s += op_len
            last_no_match = True
        elif op == cg.H:
            event, sub, qry = 0, 0, 0
            clip_h += op_len
            last_no_match = True
        else:
            raise ValueError(f'Illegal CIGAR operation while trimming: op code {op}')

        diff_change = qry if diff_query else sub

        if op in (cg.EQ, cg.X):
            trace.append((index, op_len, op, diff_cum, diff_change,
                          event_cum, event, sub_bp, qry_bp, clip_s, clip_h))

        diff_cum += diff_change
        event_cum += event
        sub_bp += sub
        qry_bp += qry

        if not (diff_cum <= diff_bp or last_no_match or len(trace) == 0):
            break

    return trace


def find_cut_sites(trace_l, trace_r, diff_bp):
    """Best (left, right) cut-site pair removing >= diff_bp bases while
    maximizing removed events; ties prefer cuts closest to diff_bp then
    left-aligned breaks (reference: trim.py:611-776)."""
    tc_idx_r = 0
    len_r = len(trace_r)

    cut_idx_l = None
    cut_idx_r = None
    max_event = 0
    max_diff_optimal = None

    for tc_idx_l in range(len(trace_l) - 1, -1, -1):
        cut_part_l = None
        cut_part_r = None
        max_event_part = 0
        max_diff_optimal_part = None

        min_bp_l = trace_l[tc_idx_l][TC_DIFF_CUM]
        max_bp_l = trace_l[tc_idx_l][TC_DIFF_CUM] + trace_l[tc_idx_l][TC_DIFF] - 1

        while (tc_idx_r + 1 < len_r
               and max_bp_l + trace_r[tc_idx_r][TC_DIFF_CUM] + trace_r[tc_idx_r][TC_DIFF] - 1 < diff_bp):
            tc_idx_r += 1

        tc_idx_r_start = tc_idx_r

        while (tc_idx_r < len_r
               and (min_bp_l + trace_r[tc_idx_r][TC_DIFF_CUM] <= diff_bp
                    or tc_idx_r == tc_idx_r_start)):

            max_bp = max_bp_l + trace_r[tc_idx_r][TC_DIFF_CUM] + trace_r[tc_idx_r][TC_DIFF] - 1
            diff_min = diff_bp - max_bp

            event_count = trace_l[tc_idx_l][TC_EVENT_CUM] + trace_r[tc_idx_r][TC_EVENT_CUM]

            if diff_min <= 0:
                event_count += min(
                    diff_bp - diff_min,
                    (trace_l[tc_idx_l][TC_EVENT] + trace_r[tc_idx_r][TC_EVENT]
                     - (1 if trace_l[tc_idx_l][TC_EVENT] > 0 else 0)
                     - (1 if trace_r[tc_idx_r][TC_EVENT] > 0 else 0)),
                )
                diff_optimal = 0
            else:
                diff_optimal = diff_min

            if (event_count > max_event_part
                    or (event_count == max_event_part
                        and (max_diff_optimal_part is None or diff_optimal < max_diff_optimal_part))):
                cut_part_l = tc_idx_l
                cut_part_r = tc_idx_r
                max_event_part = event_count
                max_diff_optimal_part = diff_optimal

            tc_idx_r += 1

        if (max_event_part > max_event
                or (max_event_part == max_event
                    and (max_diff_optimal is None
                         or (max_diff_optimal_part is not None
                             and max_diff_optimal_part < max_diff_optimal)))):
            cut_idx_l = cut_part_l
            cut_idx_r = cut_part_r
            max_event = max_event_part
            max_diff_optimal = max_diff_optimal_part

        tc_idx_r = tc_idx_r_start

    return cut_idx_l, cut_idx_r


def trim_alignment_record(record_l, record_r, match_coord, rev_l=True, rev_r=False):
    """Trim overlapping ends of two records until the overlap is resolved
    (reference: trim.py:357-608). Returns modified copies."""
    record_l = record_l.copy()
    record_r = record_r.copy()

    if match_coord not in ('query', 'subject'):
        raise ValueError(f'Unknown match_coord parameter: {match_coord}')

    lens_l, ops_l = cg.parse(record_l['CIGAR'])
    lens_r, ops_r = cg.parse(record_r['CIGAR'])

    if rev_l:
        lens_l, ops_l = lens_l[::-1], ops_l[::-1]
    if rev_r:
        lens_r, ops_r = lens_r[::-1], ops_r[::-1]

    if match_coord == 'query':
        if record_l['QRY_POS'] < record_r['QRY_POS']:
            diff_bp = record_l['QRY_END'] - record_r['QRY_POS']
        else:
            diff_bp = record_r['QRY_END'] - record_l['QRY_POS']
        if diff_bp <= 0:
            raise ValueError(f'Cannot trim to negative distance {diff_bp}')
    else:
        if record_l['POS'] > record_r['POS']:
            raise ValueError('Records are incorrectly ordered in subject space')
        diff_bp = record_l['END'] - record_r['POS']
        if diff_bp <= 0:
            raise ValueError(f'Cannot trim to negative distance {diff_bp}')

    trace_l = trace_cigar_to_zero(lens_l, ops_l, diff_bp, match_coord == 'query')
    trace_r = trace_cigar_to_zero(lens_r, ops_r, diff_bp, match_coord == 'query')

    cut_idx_l, cut_idx_r = find_cut_sites(trace_l, trace_r, diff_bp)
    if cut_idx_l is None or cut_idx_r is None:
        raise RuntimeError('Program bug: found no cut-sites')

    cut_l = trace_l[cut_idx_l]
    cut_r = trace_r[cut_idx_r]

    # Mid-record cuts, left-aligned with mismatch ops consumed first
    # (reference: trim.py:477-495).
    residual_bp = diff_bp - (cut_l[TC_DIFF_CUM] + cut_r[TC_DIFF_CUM])
    trim_l = 0
    trim_r = 0

    if residual_bp > 0 and cut_r[TC_OP_CODE] == cg.X:
        trim_r += min(residual_bp, cut_r[TC_OP_LEN] - 1)
        residual_bp -= trim_r
    if residual_bp > 0 and cut_l[TC_OP_CODE] == cg.X:
        trim_l += min(residual_bp, cut_l[TC_OP_LEN] - 1)
        residual_bp -= trim_l
    if residual_bp > 0 and cut_l[TC_OP_CODE] == cg.EQ:
        trim_l += min(residual_bp, cut_l[TC_OP_LEN] - 1)
        residual_bp -= trim_l
    if residual_bp > 0 and cut_r[TC_OP_CODE] == cg.EQ:
        trim_r += min(residual_bp, cut_r[TC_OP_LEN] - 1)
        residual_bp -= trim_r

    lens_l_mod = lens_l[cut_l[TC_INDEX]:].copy()
    ops_l_mod = ops_l[cut_l[TC_INDEX]:].copy()
    lens_r_mod = lens_r[cut_r[TC_INDEX]:].copy()
    ops_r_mod = ops_r[cut_r[TC_INDEX]:].copy()

    lens_l_mod[0] -= trim_l
    lens_r_mod[0] -= trim_r

    cut_sub_l = cut_l[TC_SUB_BP] + trim_l
    cut_qry_l = cut_l[TC_QRY_BP] + trim_l
    cut_sub_r = cut_r[TC_SUB_BP] + trim_r
    cut_qry_r = cut_r[TC_QRY_BP] + trim_r

    for record, rev, cut_sub, cut_qry in (
            (record_l, rev_l, cut_sub_l, cut_qry_l),
            (record_r, rev_r, cut_sub_r, cut_qry_r)):
        if rev:
            record['END'] -= cut_sub
            if record['REV']:
                record['QRY_POS'] += cut_qry
            else:
                record['QRY_END'] -= cut_qry
            record['TRIM_REF_R'] += cut_sub
            record['TRIM_QRY_R'] += cut_qry
        else:
            record['POS'] += cut_sub
            if record['REV']:
                record['QRY_END'] -= cut_qry
            else:
                record['QRY_POS'] += cut_qry
            record['TRIM_REF_L'] += cut_sub
            record['TRIM_QRY_L'] += cut_qry

    # Rebuild CIGARs with clip runs covering everything removed.
    def rebuild(lens_mod, ops_mod, cut, trim, rev):
        pre_lens, pre_ops = [], []
        if cut[TC_CLIPH_BP] > 0:
            pre_lens.append(cut[TC_CLIPH_BP]); pre_ops.append(cg.H)
        clip_s = cut[TC_CLIPS_BP] + cut[TC_QRY_BP] + trim
        if clip_s > 0:
            pre_lens.append(clip_s); pre_ops.append(cg.S)
        lens_new = np.concatenate([np.array(pre_lens, dtype=np.int32), lens_mod])
        ops_new = np.concatenate([np.array(pre_ops, dtype=np.int8), ops_mod])
        if rev:
            lens_new, ops_new = lens_new[::-1], ops_new[::-1]
        return cg.to_string(lens_new, ops_new)

    record_l['CIGAR'] = rebuild(lens_l_mod, ops_l_mod, cut_l, trim_l, rev_l)
    record_r['CIGAR'] = rebuild(lens_r_mod, ops_r_mod, cut_r, trim_r, rev_r)

    return record_l, record_r


def trim_alignments(df, min_trim_tig_len, qry_fai, match_tig=False, mode='both'):
    """Trim redundantly mapped bases (reference driver: trim.py:11-354).

    :param df: Alignment table with TRIM_* columns initialized.
    :param min_trim_tig_len: Records with a shorter aligned query span are dropped.
    :param qry_fai: {contig: length} for the final invariant check.
    :param match_tig: Reference-space trimming only between records of the same
        contig (redundant_callset mode).
    :param mode: 'tig' (query space), 'ref' (reference space), or 'both'.
    """
    mode = (mode or 'both').lower()
    if mode not in ('tig', 'ref', 'both'):
        raise ValueError(f'Unrecognized trimming mode: {mode}')
    do_tig = mode in ('tig', 'both')
    do_ref = mode in ('ref', 'both')

    df = df.copy()
    for col in ('TRIM_REF_L', 'TRIM_REF_R', 'TRIM_QRY_L', 'TRIM_QRY_R'):
        if col not in df.columns:
            df[col] = 0

    # Remove short alignments up front.
    df.loc[(df['QRY_END'] - df['QRY_POS']) < min_trim_tig_len, 'INDEX'] = -1
    df = df.loc[df['INDEX'] >= 0].copy()

    if do_tig:
        df = df.sort_values(['QRY_ID', 'QRY_LEN'], ascending=(True, False),
                            kind='stable').reset_index(drop=True)
        df = _trim_pass_query(df, min_trim_tig_len)
        df = df.loc[df['INDEX'] >= 0].copy()

    if do_ref:
        span = (df['END'] - df['POS']).to_numpy()
        order = np.lexsort((-span, df['#CHROM'].to_numpy()))
        df = df.iloc[order].reset_index(drop=True)
        df = _trim_pass_ref(df, min_trim_tig_len, match_tig)
        df = df.loc[df['INDEX'] >= 0].copy()

    df = df.loc[(df['END'] - df['POS']) > 0]
    df = df.loc[(df['QRY_END'] - df['QRY_POS']) > 0]
    df = sort_align_table(df)
    check_table(df, qry_fai)
    return df


def _trim_pass_query(df, min_trim_tig_len):
    """Query-space pairwise overlap resolution (reference: trim.py:71-248)."""
    index_max = df.shape[0]
    il = 0
    while il < index_max:
        ir = il + 1
        while ir < index_max and df.loc[il, 'QRY_ID'] == df.loc[ir, 'QRY_ID']:
            if df.loc[il, 'QRY_POS'] <= df.loc[ir, 'QRY_POS']:
                index_l, index_r = il, ir
            else:
                index_l, index_r = ir, il

            if df.loc[index_l, 'INDEX'] < 0 or df.loc[index_r, 'INDEX'] < 0:
                ir += 1
                continue
            if df.loc[index_r, 'QRY_POS'] >= df.loc[index_l, 'QRY_END']:
                ir += 1
                continue
            if df.loc[index_r, 'QRY_END'] <= df.loc[index_l, 'QRY_END']:
                df.loc[index_r, 'INDEX'] = -1  # contained
                ir += 1
                continue

            rev_l = not df.loc[index_l, 'REV']  # trim right end of l
            rev_r = bool(df.loc[index_r, 'REV'])  # trim left end of r

            # Reference-space overlap between the two records?
            if rev_l == rev_r or df.loc[index_l, '#CHROM'] != df.loc[index_r, '#CHROM']:
                ref_overlap = False
            elif df.loc[index_l, 'POS'] < df.loc[index_r, 'POS']:
                ref_overlap = df.loc[index_r, 'POS'] < df.loc[index_l, 'END']
            elif df.loc[index_r, 'POS'] < df.loc[index_l, 'POS']:
                ref_overlap = df.loc[index_l, 'POS'] < df.loc[index_r, 'END']
            else:
                ref_overlap = False

            if ref_overlap:
                # Same-orientation reference overlap: try both trim orders and
                # keep the better left-aligned outcome (reference: trim.py:130-197).
                rec_l_a, rec_r_a = trim_alignment_record(
                    df.loc[index_l], df.loc[index_r], 'query', rev_l=rev_l, rev_r=rev_r)
                rec_l_b, rec_r_b = trim_alignment_record(
                    df.loc[index_r], df.loc[index_l], 'query', rev_l=rev_r, rev_r=rev_l)

                keep = None
                rm_l_a = rec_l_a['QRY_END'] - rec_l_a['QRY_POS'] < min_trim_tig_len
                rm_l_b = rec_l_b['QRY_END'] - rec_l_b['QRY_POS'] < min_trim_tig_len
                rm_r_a = rec_r_a['QRY_END'] - rec_r_a['QRY_POS'] < min_trim_tig_len
                rm_r_b = rec_r_b['QRY_END'] - rec_r_b['QRY_POS'] < min_trim_tig_len
                rm_any_a = rm_l_a or rm_r_a
                rm_any_b = rm_l_b or rm_r_b

                if rm_any_a and not rm_any_b:
                    if not rm_l_a and rm_r_a:
                        keep = 'a'
                elif rm_any_b and not rm_any_a:
                    if not rm_l_b and rm_r_b:
                        keep = 'b'
                if keep is None and rm_any_a:
                    keep = 'a'
                if keep is None and rm_any_b:
                    keep = 'b'
                if keep is None:
                    trim_pos_l_a = rec_l_a['END'] if not rec_l_a['REV'] else rec_l_a['POS']
                    trim_pos_l_b = rec_l_b['END'] if not rec_l_b['REV'] else rec_l_b['POS']
                    keep = 'a' if trim_pos_l_a <= trim_pos_l_b else 'b'

                if keep == 'a':
                    record_l, record_r = rec_l_a, rec_r_a
                else:
                    record_l, record_r = rec_r_b, rec_l_b
            else:
                # Swap so the upstream-aligned end is trimmed preferentially
                # (left-aligns around large SVs; reference: trim.py:199-228).
                if (df.loc[index_l, '#CHROM'] == df.loc[index_r, '#CHROM']
                        and rev_l != rev_r):
                    trim_pos_l = (df.loc[index_l, 'END'] if not df.loc[index_l, 'REV']
                                  else df.loc[index_l, 'POS'])
                    trim_pos_r = (df.loc[index_r, 'POS'] if not df.loc[index_r, 'REV']
                                  else df.loc[index_r, 'END'])
                    if trim_pos_r < trim_pos_l:
                        rev_l, rev_r = rev_r, rev_l
                        index_l, index_r = index_r, index_l

                record_l, record_r = trim_alignment_record(
                    df.loc[index_l], df.loc[index_r], 'query', rev_l=rev_l, rev_r=rev_r)

            if record_l['QRY_END'] - record_l['QRY_POS'] >= min_trim_tig_len:
                df.loc[index_l] = record_l
            else:
                df.loc[index_l, 'INDEX'] = -1
            if record_r['QRY_END'] - record_r['QRY_POS'] >= min_trim_tig_len:
                df.loc[index_r] = record_r
            else:
                df.loc[index_r, 'INDEX'] = -1

            ir += 1
        il += 1
    return df


def _trim_pass_ref(df, min_trim_tig_len, match_tig):
    """Reference-space pairwise overlap resolution (reference: trim.py:256-331)."""
    index_max = df.shape[0]
    il = 0
    while il < index_max:
        ir = il + 1
        while ir < index_max and df.loc[il, '#CHROM'] == df.loc[ir, '#CHROM']:
            if df.loc[il, 'INDEX'] < 0 or df.loc[ir, 'INDEX'] < 0:
                ir += 1
                continue
            if match_tig and df.loc[il, 'QRY_ID'] != df.loc[ir, 'QRY_ID']:
                ir += 1
                continue

            if df.loc[il, 'POS'] <= df.loc[ir, 'POS']:
                index_l, index_r = il, ir
            else:
                index_l, index_r = ir, il

            if df.loc[index_r, 'POS'] < df.loc[index_l, 'END']:
                if df.loc[index_r, 'END'] <= df.loc[index_l, 'END']:
                    df.loc[index_r, 'INDEX'] = -1  # contained
                else:
                    record_l, record_r = trim_alignment_record(
                        df.loc[index_l], df.loc[index_r], 'subject')
                    if record_l is not None and record_r is not None:
                        if record_l['QRY_END'] - record_l['QRY_POS'] >= min_trim_tig_len:
                            df.loc[index_l] = record_l
                        else:
                            df.loc[index_l, 'INDEX'] = -1
                        if record_r['QRY_END'] - record_r['QRY_POS'] >= min_trim_tig_len:
                            df.loc[index_r] = record_r
                        else:
                            df.loc[index_r, 'INDEX'] = -1
            ir += 1
        il += 1
    return df
