"""Mesh-sharded DP execution on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from pav_tpu.align import cigar as cg
from pav_tpu.ops import affine_dp
from pav_tpu.parallel.mesh import make_mesh

from helpers import random_seq


def test_sharded_dp_matches_single_device():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)

    rng = np.random.default_rng(17)
    pairs = []
    for _ in range(64):
        m = int(rng.integers(8, 60))
        q = random_seq(m, rng)
        r = q.copy()
        if m > 12:
            r = np.delete(r, slice(3, 6))
        pairs.append((q, r))

    single = affine_dp.BandedAligner()
    sharded = affine_dp.BandedAligner(mesh=mesh)

    res_single = single.align_batch(pairs, width=65, pad_to=64)
    res_sharded = sharded.align_batch(pairs, width=65, pad_to=64)

    for (l1, o1), (l2, o2) in zip(res_single, res_sharded):
        assert cg.to_string(l1, o1) == cg.to_string(l2, o2)


def test_sharded_aligner_end_to_end():
    from pav_tpu.align.aligner import Aligner
    from pav_tpu.align.table import check_table
    from pav_tpu.io.fasta import SeqStore

    mesh = make_mesh(8)
    rng = np.random.default_rng(18)
    ref = random_seq(60000, rng)
    contig = ref[5000:55000].copy()
    contig[1000] = (contig[1000] + 1) % 4

    ref_store = SeqStore({'c': ref})
    al = Aligner(ref_store, {'aligner_min_chain_score': 500})
    al.dp = affine_dp.BandedAligner(al.dp.scoring, mesh=mesh)
    qry = SeqStore({'t': contig})
    df = al.align_store(qry, 'h1')
    check_table(df, qry.fai())
    assert df.shape[0] == 1
