"""Tabix index writer/reader round trip over BGZF output."""

import gzip

import numpy as np
import pytest

from pav_tpu.io.bgzf import BgzfWriter
from pav_tpu.io.tabix import TabixIndex, reg2bin, write_tabix


def test_reg2bin():
    assert reg2bin(0, 1) == 4681
    assert reg2bin(0, 1 << 14) == 4681
    assert reg2bin(0, (1 << 14) + 1) == 585
    assert reg2bin(1 << 26, (1 << 26) + 5) > 0


def test_tabix_roundtrip(tmp_path):
    vcf_path = str(tmp_path / 'x.vcf.gz')
    rng = np.random.default_rng(3)

    positions = sorted(rng.choice(np.arange(1, 5_000_000), 500, replace=False).tolist())
    records = []
    out = BgzfWriter(vcf_path)
    out.write('##fileformat=VCFv4.2\n')
    out.write('#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n')
    for i, pos1 in enumerate(positions):
        vs = out.tell_virtual()
        out.write(f'chr1\t{pos1}\tv{i}\tA\tC\t.\tPASS\t.\n')
        records.append(('chr1', pos1 - 1, pos1, vs, out.tell_virtual()))
    out.close()

    tbi_path = vcf_path + '.tbi'
    write_tabix(records, tbi_path)

    idx = TabixIndex(tbi_path)
    assert idx.names == ['chr1']

    # Query several ranges; compare against brute force.
    for lo, hi in ((0, 100000), (1_000_000, 1_050_000), (4_900_000, 5_000_000),
                   (2_345_678, 2_345_679)):
        want = {p for p in positions if lo <= p - 1 < hi}
        got = {int(line.split('\t')[1]) for line in idx.query(vcf_path, 'chr1', lo, hi)}
        assert got == want, f'range {lo}-{hi}'


def test_vcf_writer_emits_tbi(tmp_path):
    import pandas as pd
    from pav_tpu import vcf as vcf_mod
    from pav_tpu.io.fasta import SeqStore
    from pav_tpu import seqcodec

    ref = SeqStore({'c1': seqcodec.encode('ACGT' * 2500)})
    df_snv = pd.DataFrame([{
        '#CHROM': 'c1', 'POS': 100, 'END': 101, 'ID': 'c1-101-SNV-AT',
        'SVTYPE': 'SNV', 'SVLEN': 1, 'REF': 'A', 'ALT': 'T', 'FILTER': 'PASS',
        'HAP': 'h1', 'HAP_VARIANTS': 'c1-101-SNV-AT', 'COV_MEAN': 1.0,
        'COV_PROP': 1.0, 'QRY_REGION': 'q:1-1', 'QRY_STRAND': '+',
        'CALL_SOURCE': 'CIGAR', 'GT': '1|0',
    }])
    out_path = str(tmp_path / 's.vcf.gz')
    vcf_mod.write_merged_vcf(
        's', {('snv_snv', 'pass'): df_snv}, out_path, ref,
        vcf_mod.ref_info_table(ref))
    idx = TabixIndex(out_path + '.tbi')
    lines = list(idx.query(out_path, 'c1', 90, 110))
    assert len(lines) == 1 and '\tc1-101-SNV-AT\t' in lines[0]
