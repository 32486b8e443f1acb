"""BigBed container writer/reader round-trip and structural validation.

The reference builds BigBed tracks with UCSC bedToBigBed
(rules/tracks.snakefile:115,192); pav_tpu writes the bbi container natively
(pav_tpu/io/bigbed.py). These tests validate the container structure with an
independent minimal reader and check track-level wiring.
"""

import struct

import numpy as np
import pandas as pd
import pytest

from pav_tpu.io.bigbed import (BIGBED_MAGIC, read_bigbed, write_bigbed)


def _df(n, chroms=('chr1', 'chr2'), seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        chrom = chroms[int(rng.integers(0, len(chroms)))]
        pos = int(rng.integers(0, 900000))
        end = pos + int(rng.integers(1, 500))
        rows.append({'#CHROM': chrom, 'POS': pos, 'END': end,
                     'ID': f'var-{i}', 'SVTYPE': 'INS', 'SVLEN': end - pos})
    return pd.DataFrame(rows)


CHROM_SIZES = {'chr1': 1000000, 'chr2': 1000000}


def test_roundtrip_small(tmp_path):
    df = _df(37)
    out = tmp_path / 'small.bb'
    write_bigbed(df, CHROM_SIZES, out, extra_cols=('ID', 'SVTYPE', 'SVLEN'))
    hdr, chroms, records = read_bigbed(out)
    assert hdr['fieldCount'] == 6
    assert chroms == CHROM_SIZES
    assert len(records) == 37
    # Records come back sorted by (chrom, start).
    keys = [(c, s) for c, s, _, _ in records]
    assert keys == sorted(keys)
    # Every input row survives with its rest-fields intact.
    want = set()
    for row in df.itertuples(index=False):
        want.add((row[0], int(row.POS), max(int(row.END), int(row.POS) + 1),
                  f'{row.ID}\tINS\t{row.SVLEN}'))
    assert set(records) == want


def test_roundtrip_multiblock_with_zoom(tmp_path):
    df = _df(3000, seed=1)
    out = tmp_path / 'big.bb'
    write_bigbed(df, CHROM_SIZES, out, extra_cols=('ID', 'SVTYPE', 'SVLEN'))
    hdr, chroms, records = read_bigbed(out)
    assert len(records) == 3000
    assert hdr['zoomLevels'] >= 1


def test_header_magic_and_trailer(tmp_path):
    df = _df(5)
    out = tmp_path / 't.bb'
    write_bigbed(df, CHROM_SIZES, out, extra_cols=('ID',))
    raw = out.read_bytes()
    assert struct.unpack_from('<I', raw, 0)[0] == BIGBED_MAGIC
    assert struct.unpack_from('<I', raw, len(raw) - 4)[0] == BIGBED_MAGIC


def test_empty_table(tmp_path):
    df = pd.DataFrame(columns=['#CHROM', 'POS', 'END', 'ID'])
    out = tmp_path / 'empty.bb'
    write_bigbed(df, CHROM_SIZES, out, extra_cols=('ID',))
    hdr, chroms, records = read_bigbed(out)
    assert records == []


def test_unknown_chrom_rejected(tmp_path):
    df = pd.DataFrame([{'#CHROM': 'chrX', 'POS': 0, 'END': 10, 'ID': 'a'}])
    with pytest.raises(ValueError):
        write_bigbed(df, CHROM_SIZES, tmp_path / 'x.bb', extra_cols=('ID',))


def test_uncompressed_mode(tmp_path):
    df = _df(10, seed=2)
    out = tmp_path / 'u.bb'
    write_bigbed(df, CHROM_SIZES, out, extra_cols=('ID', 'SVTYPE', 'SVLEN'),
                 compress=False)
    hdr, chroms, records = read_bigbed(out)
    assert len(records) == 10


def test_variant_track_bigbed(tmp_path):
    """tracks.variant_track_bigbed emits a loadable .bb for a call table."""
    from pav_tpu.tracks import variant_track_bigbed

    df = _df(50, seed=3)
    df['FILTER'] = 'PASS'
    out = tmp_path / 'variants.bb'
    variant_track_bigbed(df, CHROM_SIZES, out)
    hdr, chroms, records = read_bigbed(out)
    assert len(records) == 50
    # BED9+: name/score/strand/thickStart/thickEnd/rgb + ID/SVTYPE/SVLEN/FILTER
    rest = records[0][3].split('\t')
    assert len(rest) == 10


def test_alignment_track_bigbed(tmp_path):
    from pav_tpu.tracks import alignment_track_bigbed

    df = pd.DataFrame([
        {'#CHROM': 'chr1', 'POS': 100, 'END': 5000, 'QRY_ID': 'tig1',
         'QRY_POS': 0, 'QRY_END': 4900, 'MAPQ': 60, 'REV': False,
         'HAP': 'h1', 'INDEX': 0},
        {'#CHROM': 'chr2', 'POS': 200, 'END': 800, 'QRY_ID': 'tig1',
         'QRY_POS': 4900, 'QRY_END': 5500, 'MAPQ': 30, 'REV': True,
         'HAP': 'h1', 'INDEX': 1},
    ])
    out = tmp_path / 'align.bb'
    alignment_track_bigbed(df, CHROM_SIZES, out)
    hdr, chroms, records = read_bigbed(out)
    assert len(records) == 2
    assert records[0][0] == 'chr1'
