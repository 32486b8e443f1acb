"""Inversion recall across the size spectrum and both detection routes:
aligned-through (FLAG-DEN via signature flagging + density) and
alignment-truncating (ALNTRUNC-DEN via split records)."""

import os

import numpy as np
import pytest

from pav_tpu.io.fasta import SeqStore
from pav_tpu.pipeline import Pipeline

from helpers import Mutator, random_seq


@pytest.mark.parametrize('inv_len,route', [
    (300, 'FLAG-DEN'),
    (500, 'ALNTRUNC-DEN'),
    (2000, 'ALNTRUNC-DEN'),
])
def test_inversion_sizes(inv_len, route):
    rng = np.random.default_rng(91)
    ref = random_seq(80000, rng)
    m = Mutator(ref)
    m.inv(40000, inv_len)
    h = m.finish()

    pipeline = Pipeline(SeqStore({'c': ref}), {'aligner_min_chain_score': 500},
                        log=open(os.devnull, 'w'))
    res = pipeline.run_haplotype(SeqStore({'t': h}), 'h1')
    inv_pass = res.integrated['sv_inv'][0]

    assert inv_pass.shape[0] == 1, f'{inv_len}bp inversion not called'
    row = inv_pass.iloc[0]
    # Outer breakpoints bracket the event (within slack + flank tolerance).
    assert row['POS'] <= 40000 + 50 and row['END'] >= 40000 + inv_len - 50
    assert row['SVLEN'] <= inv_len + 500
    assert row['CALL_SOURCE'] == route
    # MAPQ stays high for a clean unique alignment.
    assert (res.align_qryref['MAPQ'] >= 50).all()
