"""SAM emission: alignment tables -> SAM text.

Parity with the reference's alignment reconstruction
(scripts/reconstruct_sam.py:28-102 + rules/align.snakefile:305-327, which pipes
through `samtools view -O CRAM`); without htslib in the image, SAM (optionally
gzip) is emitted directly — convertible to BAM/CRAM with samtools when
available. SAM parsing lives in pav_tpu.align.table.read_sam.
"""

import gzip

from .. import seqcodec
from ..align import cigar as cg


def write_sam(df_align, qry_store, ref_fai, out_path, hard_to_soft=True):
    """Write alignment records as SAM.

    :param df_align: Alignment table (any trim tier).
    :param qry_store: Contig SeqStore (sequences for SEQ field).
    :param ref_fai: {chrom: length} for @SQ headers.
    :param hard_to_soft: Emit clipped contig bases as soft clips with full
        sequence (reconstructed records carry the whole contig, matching the
        reference's reconstruction; reference: scripts/reconstruct_sam.py:60-84).
    """
    opener = gzip.open if str(out_path).endswith('.gz') else open
    with opener(out_path, 'wt') as fh:
        fh.write('@HD\tVN:1.6\tSO:coordinate\n')
        for chrom, length in ref_fai.items():
            fh.write(f'@SQ\tSN:{chrom}\tLN:{length}\n')
        fh.write('@PG\tID:pav_tpu\tPN:pav_tpu\n')

        for _, row in df_align.iterrows():
            lens, ops = cg.parse(row['CIGAR'])
            flag = int(str(row['FLAGS']), 16) if isinstance(row['FLAGS'], str) else int(row['FLAGS'])
            codes = qry_store.fetch_codes(row['QRY_ID'], rev_compl=bool(row['REV']))

            if hard_to_soft:
                ops = ops.copy()
                ops[ops == cg.H] = cg.S
                seq = seqcodec.decode(codes)
            else:
                # Drop hard-clipped bases from SEQ.
                clip_l = int(lens[0]) if len(ops) and ops[0] == cg.H else 0
                clip_r = int(lens[-1]) if len(ops) > 1 and ops[-1] == cg.H else 0
                seq = seqcodec.decode(codes[clip_l:len(codes) - clip_r or None])

            fh.write('\t'.join((
                str(row['QRY_ID']), str(flag), str(row['#CHROM']),
                str(int(row['POS']) + 1), str(int(row['MAPQ'])),
                cg.to_string(lens, ops), '*', '0', '0', seq, '*',
                f'RG:Z:{row["RG"]}' if row.get('RG', 'NA') != 'NA' else 'RG:Z:NA',
            )) + '\n')
