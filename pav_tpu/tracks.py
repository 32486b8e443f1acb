"""Browser-track emission: variant and alignment BED9+ tracks.

Parity with the reference's track rules (rules/tracks.snakefile:99-307): call
tables and alignment tiers become UCSC-loadable BED9+ files with per-haplotype
colors and query-order annotation. BigBed conversion is an external-tool step
in the reference (bedToBigBed); here plain (optionally gzipped) BED is emitted
— loadable directly or convertible with the same tool when available.
"""

import gzip

# Viridis-like per-haplotype colors (reference uses matplotlib viridis:
# rules/tracks.snakefile:251-259).
_HAP_COLORS = ['68,1,84', '33,145,140', '94,201,98', '253,231,37',
               '59,82,139', '33,229,249']

_SVTYPE_COLORS = {
    'INS': '0,0,255',
    'DEL': '255,0,0',
    'INV': '0,128,0',
    'SNV': '0,0,0',
}


def variant_track(df, out_path, name='pav_variants'):
    """Write a variant call table as BED9+ (ID, SVTYPE, SVLEN, FILTER kept)."""
    opener = gzip.open if str(out_path).endswith('.gz') else open
    with opener(out_path, 'wt') as fh:
        fh.write(f'track name={name} itemRgb=On\n')
        for _, row in df.iterrows():
            end = max(int(row['END']), int(row['POS']) + 1)
            color = _SVTYPE_COLORS.get(str(row.get('SVTYPE', '')), '0,0,0')
            fh.write('\t'.join(str(v) for v in (
                row['#CHROM'], int(row['POS']), end, row['ID'], 0, '+',
                int(row['POS']), end, color,
                row.get('SVTYPE', ''), row.get('SVLEN', ''),
                row.get('FILTER', 'PASS'),
            )) + '\n')


def alignment_track(df_align, out_path, name='pav_align'):
    """Write an alignment tier as BED9+ with per-haplotype colors and
    query-order index."""
    opener = gzip.open if str(out_path).endswith('.gz') else open
    hap_ids = {h: i for i, h in enumerate(sorted(set(df_align['HAP'])))}
    # Query order: rank of each record along its contig.
    order = df_align.sort_values(['QRY_ID', 'QRY_POS']).groupby('QRY_ID').cumcount()
    order = order.reindex(df_align.index)
    with opener(out_path, 'wt') as fh:
        fh.write(f'track name={name} itemRgb=On\n')
        for (_, row), qorder in zip(df_align.iterrows(), order):
            color = _HAP_COLORS[hap_ids[row['HAP']] % len(_HAP_COLORS)]
            strand = '-' if row['REV'] else '+'
            label = f"{row['QRY_ID']}:{int(row['QRY_POS'])}-{int(row['QRY_END'])}({qorder})"
            fh.write('\t'.join(str(v) for v in (
                row['#CHROM'], int(row['POS']), int(row['END']), label,
                int(row['MAPQ']) * 16 if int(row['MAPQ']) < 63 else 1000,
                strand, int(row['POS']), int(row['END']), color,
                row['HAP'], int(row['INDEX']),
            )) + '\n')
