"""CIGAR-walk variant extraction: SNV + INS/DEL (indel and SV) calls.

Semantics parity with the reference caller (pavlib/cigarcall.py:24-362):
X ops emit per-base SNVs; I/D ops emit INS/DEL with tandem-repeat left-shift
through preceding '=' runs and breakpoint-homology annotation on both reference
and contig, in both directions. DEL output coordinates remain unshifted while
INS coordinates shift, matching the reference's emitted tables exactly.

Unlike the reference's per-op Python walk, ops are processed as whole numpy
arrays per alignment record, and all homology searches of a record are resolved
in one batched kernel call.
"""

import numpy as np
import pandas as pd

from .. import seqcodec
from ..align import cigar as cg
from ..constants import CALL_SOURCE_CIGAR
from . import homology as hom
from .variant_id import version_id

SNV_COLUMNS = [
    '#CHROM', 'POS', 'END', 'ID', 'SVTYPE', 'SVLEN', 'REF', 'ALT', 'HAP',
    'QRY_REGION', 'QRY_STRAND', 'CI', 'ALIGN_INDEX', 'CALL_SOURCE',
]

INSDEL_COLUMNS = [
    '#CHROM', 'POS', 'END', 'ID', 'SVTYPE', 'SVLEN', 'HAP',
    'QRY_REGION', 'QRY_STRAND', 'CI', 'ALIGN_INDEX',
    'LEFT_SHIFT', 'HOM_REF', 'HOM_TIG', 'CALL_SOURCE', 'SEQ',
]

# Ops advancing the contig cursor in the caller's walk (the full contig sequence
# is in hand, so clipped bases advance too — reference: pavlib/cigarcall.py:286-287).
_ADV_QRY = np.zeros(9, dtype=np.int64)
_ADV_QRY[[cg.EQ, cg.X, cg.I, cg.S, cg.H]] = 1
_ADV_REF = np.zeros(9, dtype=np.int64)
_ADV_REF[[cg.EQ, cg.X, cg.D]] = 1


def make_insdel_snv_calls(df_align, ref_store, qry_store, hap, version_ids=True):
    """Extract SNV and INS/DEL calls from every alignment record's CIGAR.

    :param df_align: Alignment table (post-trim).
    :param ref_store: SeqStore of the reference.
    :param qry_store: SeqStore of the haplotype contigs.
    :param hap: Haplotype label.
    :param version_ids: De-duplicate IDs when True.

    :return: (df_snv, df_insdel).
    """
    snv_rows = []
    insdel_rows = []

    for _, row in df_align.iterrows():
        _call_record(row, ref_store, qry_store, hap, snv_rows, insdel_rows)

    df_snv = pd.DataFrame(snv_rows, columns=SNV_COLUMNS)
    df_insdel = pd.DataFrame(insdel_rows, columns=INSDEL_COLUMNS)

    if df_snv.shape[0]:
        if version_ids:
            df_snv['ID'] = version_id(df_snv['ID'])
        df_snv = df_snv.sort_values(['#CHROM', 'POS', 'END', 'ID']).reset_index(drop=True)
    if df_insdel.shape[0]:
        if version_ids:
            df_insdel['ID'] = version_id(df_insdel['ID'])
        df_insdel = df_insdel.sort_values(['#CHROM', 'POS', 'END', 'ID']).reset_index(drop=True)

    return df_snv, df_insdel


def _call_record(row, ref_store, qry_store, hap, snv_rows, insdel_rows):
    chrom = row['#CHROM']
    qry_id = row['QRY_ID']
    is_rev = bool(row['REV'])
    strand = '-' if is_rev else '+'
    align_index = row['INDEX']

    ref_seq = ref_store.get(chrom)
    tig_seq = qry_store.fetch_codes(qry_id, rev_compl=is_rev)
    tig_len = len(tig_seq)

    lens, ops = cg.parse(row['CIGAR'])
    lens64 = lens.astype(np.int64)

    if np.any(ops == cg.M):
        raise ValueError(
            f'Illegal M operation in CIGAR (=/X required): align-index={align_index}')

    # Cursor positions at the start of each op.
    ref_pos = int(row['POS']) + np.concatenate([[0], np.cumsum(lens64 * _ADV_REF[ops])])[:-1]
    tig_pos = np.concatenate([[0], np.cumsum(lens64 * _ADV_QRY[ops])])[:-1]

    # --- SNVs from X ops (vectorized across all X bases of the record) ---
    x_idx = np.nonzero(ops == cg.X)[0]
    if len(x_idx):
        reps = lens64[x_idx]
        offsets = np.concatenate([np.arange(r) for r in reps])
        pos_ref_snv = np.repeat(ref_pos[x_idx], reps) + offsets
        pos_tig_snv = np.repeat(tig_pos[x_idx], reps) + offsets

        ref_bases = seqcodec.decode(ref_seq[pos_ref_snv])
        alt_bases = seqcodec.decode(tig_seq[pos_tig_snv])

        pos_tig_out = tig_len - pos_tig_snv - 1 if is_rev else pos_tig_snv

        for pr, pt, rb, ab in zip(pos_ref_snv.tolist(), pos_tig_out.tolist(), ref_bases, alt_bases):
            snv_rows.append((
                chrom, pr, pr + 1,
                f'{chrom}-{pr + 1}-SNV-{rb}{ab}', 'SNV', 1,
                rb, ab, hap,
                f'{qry_id}:{pt + 1}-{pt + 1}', strand,
                0, align_index, CALL_SOURCE_CIGAR,
            ))

    # --- INS / DEL ---
    ins_idx = np.nonzero(ops == cg.I)[0]
    del_idx = np.nonzero(ops == cg.D)[0]
    var_idx = np.sort(np.concatenate([ins_idx, del_idx]))
    if len(var_idx) == 0:
        return

    is_ins = ops[var_idx] == cg.I
    oplen = lens64[var_idx]
    v_ref = ref_pos[var_idx]
    v_tig = tig_pos[var_idx]

    # Left-shift bound: length of an immediately-preceding '=' run, else 0.
    prev_eq_len = np.zeros(len(var_idx), dtype=np.int64)
    has_prev = var_idx > 0
    prev_ops = ops[np.maximum(var_idx - 1, 0)]
    mask = has_prev & (prev_ops == cg.EQ)
    prev_eq_len[mask] = lens64[np.maximum(var_idx - 1, 0)][mask]

    # SV sequences (unshifted): INS from contig, DEL from reference.
    sv_seqs = [
        (tig_seq[v_tig[i]:v_tig[i] + oplen[i]] if is_ins[i]
         else ref_seq[v_ref[i]:v_ref[i] + oplen[i]])
        for i in range(len(var_idx))
    ]
    arena, offs, svlens = hom.make_arena(sv_seqs)

    # Left shift = min(preceding '=' run, upstream ref homology with the SV seq).
    ls_hom = hom.left_homology_batch(v_ref - 1, ref_seq, arena, offs, svlens)
    left_shift = np.minimum(prev_eq_len, ls_hom)

    sv_pos_ref = v_ref - left_shift
    sv_pos_tig = v_tig - left_shift

    # Re-extract INS sequences at the shifted contig position
    # (reference: pavlib/cigarcall.py:162-163; DEL seq stays unshifted: :221, :233-245).
    shifted = is_ins & (left_shift > 0)
    if shifted.any():
        for i in np.nonzero(shifted)[0]:
            sv_seqs[i] = tig_seq[sv_pos_tig[i]:sv_pos_tig[i] + oplen[i]]
        arena, offs, svlens = hom.make_arena(sv_seqs)

    sv_end_ref = np.where(is_ins, sv_pos_ref + 1, sv_pos_ref + oplen)
    sv_end_tig = np.where(is_ins, sv_pos_tig + oplen, sv_pos_tig + 1)

    # Breakpoint homology, four directions in two batched calls per sequence space.
    hom_ref_l = hom.left_homology_batch(sv_pos_ref - 1, ref_seq, arena, offs, svlens)
    hom_ref_r_pos = np.where(is_ins, sv_pos_ref, sv_end_ref)
    hom_ref_r = hom.right_homology_batch(hom_ref_r_pos, ref_seq, arena, offs, svlens)

    hom_tig_l = hom.left_homology_batch(sv_pos_tig - 1, tig_seq, arena, offs, svlens)
    hom_tig_r_pos = np.where(is_ins, sv_pos_tig + oplen, sv_pos_tig)
    hom_tig_r = hom.right_homology_batch(hom_tig_r_pos, tig_seq, arena, offs, svlens)

    for i in range(len(var_idx)):
        ol = int(oplen[i])
        if is_ins[i]:
            # Output coordinates in original contig orientation.
            if is_rev:
                end_tig_out = tig_len - int(sv_pos_tig[i])
                pos_tig_out = end_tig_out - ol
            else:
                pos_tig_out = int(sv_pos_tig[i])
                end_tig_out = pos_tig_out + ol
            insdel_rows.append((
                chrom, int(sv_pos_ref[i]), int(sv_pos_ref[i]) + 1,
                f'{chrom}-{int(sv_pos_ref[i]) + 1}-INS-{ol}', 'INS', ol, hap,
                f'{qry_id}:{pos_tig_out + 1}-{end_tig_out}', strand,
                0, align_index,
                int(left_shift[i]),
                f'{int(hom_ref_l[i])},{int(hom_ref_r[i])}',
                f'{int(hom_tig_l[i])},{int(hom_tig_r[i])}',
                CALL_SOURCE_CIGAR,
                seqcodec.decode(sv_seqs[i]),
            ))
        else:
            pos_tig_out = int(sv_pos_tig[i])
            if is_rev:
                pos_tig_out = tig_len - int(sv_pos_tig[i])
            insdel_rows.append((
                chrom, int(v_ref[i]), int(v_ref[i]) + ol,
                f'{chrom}-{int(v_ref[i]) + 1}-DEL-{ol}', 'DEL', ol, hap,
                f'{qry_id}:{pos_tig_out + 1}-{pos_tig_out + 1}', strand,
                0, align_index,
                int(left_shift[i]),
                f'{int(hom_ref_l[i])},{int(hom_ref_r[i])}',
                f'{int(hom_tig_l[i])},{int(hom_tig_r[i])}',
                CALL_SOURCE_CIGAR,
                seqcodec.decode(sv_seqs[i]),
            ))
