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


def test_pipeline_under_mesh_vcf_identical(tmp_path):
    """Whole-engine run under the 8-device mesh produces a VCF byte-identical
    in record content to the single-device run (VERDICT r1 item 6)."""
    import gzip

    from pav_tpu.io.fasta import SeqStore
    from pav_tpu.pipeline import Pipeline

    from helpers import Mutator

    rng = np.random.default_rng(23)
    ref = random_seq(120000, rng)

    def mk(seed, with_inv):
        r = np.random.default_rng(seed)
        m = Mutator(ref)
        m.snv(8000, rng=r)
        m.ins(20000, random_seq(180, r))
        m.dele(40000, 230)
        m.snv(60000, rng=r)
        if with_inv:
            m.inv(80000, 3500)
        return m.finish()

    h1, h2 = mk(1, False), mk(2, True)

    def run(mesh_devices, sub):
        cfg = {'aligner_min_chain_score': 500}
        if mesh_devices:
            cfg['mesh_devices'] = mesh_devices
        pipe = Pipeline(SeqStore({'chr1': ref}), cfg,
                        run_dir=str(tmp_path / sub))
        res = pipe.run_sample(
            'S', {'h1': SeqStore({'t1': h1}), 'h2': SeqStore({'t2': h2})})
        with gzip.open(res['vcf'], 'rt') as fh:
            return [l for l in fh if not l.startswith('##')]

    lines_single = run(0, 'single')
    lines_mesh = run(8, 'mesh')
    assert len(lines_single) > 6
    assert lines_single == lines_mesh
