"""Multi-host cohort fan-out: two real processes, jax.distributed
coordination, samples sharded round-robin, manifest gathered on every process
(reference analog: Snakemake cluster distribution, NATIVE_INSTALL.md:68-103)."""

import gzip
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from helpers import Mutator, random_seq

from pav_tpu import seqcodec
from pav_tpu.parallel.multihost import shard_samples

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_shard_samples_deterministic():
    names = [f'S{i}' for i in range(7)]
    shards = [shard_samples(names, p, 3) for p in range(3)]
    # Disjoint, complete, deterministic under input order.
    assert sorted(sum(shards, [])) == sorted(names)
    assert shards == [shard_samples(list(reversed(names)), p, 3)
                      for p in range(3)]


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_cohort_two_processes(tmp_path):
    rng = np.random.default_rng(21)
    ref = random_seq(60000, rng)

    def hap(seed, snv_at):
        r = np.random.default_rng(seed)
        mut = Mutator(ref)
        mut.snv(snv_at, rng=r)
        mut.dele(40000, 120)
        return mut.finish()

    (tmp_path / 'ref.fa').write_text('>chr1\n' + seqcodec.decode(ref) + '\n')
    for si, snv_at in ((1, 5000), (2, 9000)):
        for hi in (1, 2):
            seq = hap(10 * si + hi, snv_at)
            (tmp_path / f's{si}h{hi}.fa').write_text(
                f'>tig{si}{hi}\n' + seqcodec.decode(seq) + '\n')
    (tmp_path / 'asm.tsv').write_text(
        'NAME\tHAP_h1\tHAP_h2\n'
        'SampA\ts1h1.fa\ts1h2.fa\n'
        'SampB\ts2h1.fa\ts2h2.fa\n')

    port = _free_port()
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYTHONPATH'] = ROOT
    env.pop('XLA_FLAGS', None)   # no virtual device splitting in children

    def launch(pid):
        # Per-process run dirs + --ship-artifacts: models a cohort WITHOUT a
        # shared filesystem — every process must end up with every VCF,
        # replicated through the coordination KV store.
        return subprocess.Popen(
            [sys.executable, '-m', 'pav_tpu',
             '--ref', 'ref.fa', '--assemblies', 'asm.tsv',
             '--run-dir', f'run{pid}', '--ship-artifacts',
             '--coordinator', f'localhost:{port}',
             '--num-processes', '2', '--process-id', str(pid),
             '--set', 'aligner_min_chain_score=500'],
            cwd=tmp_path, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)

    procs = [launch(0), launch(1)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f'rc={p.returncode}\n{out}\n{err}'
        outs.append(out)

    # Every process prints the FULL cohort manifest (gathered cross-process).
    for out in outs:
        assert 'SampA:' in out and 'SampB:' in out

    # One process ran each sample (round-robin by sorted name).
    procs_of = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith('Samp'):
                name = line.split(':')[0]
                procs_of[name] = line.rsplit('process ', 1)[1].rstrip(')')
    assert procs_of == {'SampA': '0', 'SampB': '1'}

    # EVERY process has EVERY sample's VCF locally (ship-artifacts contract:
    # the sample ran on one process; the other received the bytes through
    # the KV store), each containing its planted SNV.
    for run_dir in ('run0', 'run1'):
        for sample, pos in (('SampA', 5001), ('SampB', 9001)):
            vcf = tmp_path / run_dir / f'{sample}.vcf.gz'
            assert vcf.exists(), f'{run_dir}/{sample} VCF missing'
            positions = {int(ln.split('\t')[1])
                         for ln in gzip.open(vcf, 'rt')
                         if not ln.startswith('#')}
            assert pos in positions, f'{sample}: planted SNV {pos} not called'


@pytest.mark.slow
def test_cohort_keep_going_dead_member(tmp_path):
    """Keep-going semantics (reference analog: Snakemake --keep-going,
    profiles/default/config.yaml:2-5): a member that joins the cohort and
    dies before publishing its shard must not abort the others — survivors
    mark its samples unreachable and still emit the full manifest."""
    rng = np.random.default_rng(31)
    ref = random_seq(60000, rng)

    def hap(seed, snv_at):
        r = np.random.default_rng(seed)
        mut = Mutator(ref)
        mut.snv(snv_at, rng=r)
        return mut.finish()

    (tmp_path / 'ref.fa').write_text('>chr1\n' + seqcodec.decode(ref) + '\n')
    for si, snv_at in ((1, 5000), (2, 9000), (3, 15000)):
        for hi in (1, 2):
            seq = hap(10 * si + hi, snv_at)
            (tmp_path / f's{si}h{hi}.fa').write_text(
                f'>tig{si}{hi}\n' + seqcodec.decode(seq) + '\n')
    (tmp_path / 'asm.tsv').write_text(
        'NAME\tHAP_h1\tHAP_h2\n'
        'SampA\ts1h1.fa\ts1h2.fa\n'
        'SampB\ts2h1.fa\ts2h2.fa\n'
        'SampC\ts3h1.fa\ts3h2.fa\n')

    port = _free_port()
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYTHONPATH'] = ROOT
    env.pop('XLA_FLAGS', None)

    def launch(pid):
        return subprocess.Popen(
            [sys.executable, '-m', 'pav_tpu',
             '--ref', 'ref.fa', '--assemblies', 'asm.tsv', '--run-dir', 'run',
             '--coordinator', f'localhost:{port}',
             '--num-processes', '3', '--process-id', str(pid),
             '--cohort-timeout', '30',
             '--set', 'aligner_min_chain_score=500'],
            cwd=tmp_path, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)

    # Process 2 joins the coordination service, completes backend init (the
    # global topology exchange every member must survive — a member dead
    # before it would break device init cohort-wide), then crashes without
    # publishing its shard (SampC) — the induced mid-run member failure.
    dead = subprocess.Popen(
        [sys.executable, '-c',
         'import os; from pav_tpu.parallel.multihost import init;'
         f'init("localhost:{port}", 3, 2); import jax; jax.devices(); '
         'os._exit(1)'],
        cwd=tmp_path, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)

    procs = [launch(0), launch(1)]
    dead.communicate(timeout=300)
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        # Keep-going exits nonzero (failed samples present) but must not crash.
        assert p.returncode == 1, f'rc={p.returncode}\n{out}\n{err}'
        outs.append(out)

    for out in outs:
        assert 'SampC: ERROR process unreachable' in out, out
        assert 'SampA:' in out and 'SampB:' in out

    # The surviving samples' VCFs were still produced.
    for sample, pos in (('SampA', 5001), ('SampB', 9001)):
        vcf = tmp_path / 'run' / f'{sample}.vcf.gz'
        assert vcf.exists(), f'{sample} VCF missing'
        positions = {int(ln.split('\t')[1])
                     for ln in gzip.open(vcf, 'rt') if not ln.startswith('#')}
        assert pos in positions, f'{sample}: planted SNV {pos} not called'


@pytest.mark.slow
def test_cohort_throughput_two_processes(tmp_path):
    """Measured samples/hour at 1 vs 2 cohort processes (VERDICT r4 next #9).

    Four identical samples; wall time of a 1-process cohort vs a 2-process
    cohort on the same host. On this 4-core machine each pipeline already
    fans out ~4 worker threads, so the expected 2-process speedup is bounded
    well below 2x by core oversubscription — the measured ratio is recorded
    (printed + docs/SCALING.md) as the honest shared-host datapoint; on real
    multi-host deployments each process owns its cores. The assertion only
    guards against cohort overhead making 2 processes SLOWER."""
    import time

    rng = np.random.default_rng(33)
    ref = random_seq(120000, rng)

    (tmp_path / 'ref.fa').write_text('>chr1\n' + seqcodec.decode(ref) + '\n')
    rows = ['NAME\tHAP_h1\tHAP_h2']
    for si in range(4):
        for hi in (1, 2):
            r = np.random.default_rng(100 * si + hi)
            mut = Mutator(ref)
            mut.snv(4000 + 1000 * si, rng=r)
            mut.dele(60000, 150)
            (tmp_path / f's{si}h{hi}.fa').write_text(
                f'>tig{si}{hi}\n' + seqcodec.decode(mut.finish()) + '\n')
        rows.append(f'Samp{si}\ts{si}h1.fa\ts{si}h2.fa')
    (tmp_path / 'asm.tsv').write_text('\n'.join(rows) + '\n')

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYTHONPATH'] = ROOT
    env.pop('XLA_FLAGS', None)

    def run_cohort(n_procs, tag):
        port = _free_port()
        procs = []
        for pid in range(n_procs):
            args = [sys.executable, '-m', 'pav_tpu',
                    '--ref', 'ref.fa', '--assemblies', 'asm.tsv',
                    '--run-dir', f'run_{tag}_{pid}',
                    '--set', 'aligner_min_chain_score=500']
            if n_procs > 1:
                args += ['--coordinator', f'localhost:{port}',
                         '--num-processes', str(n_procs),
                         '--process-id', str(pid)]
            procs.append(subprocess.Popen(
                args, cwd=tmp_path, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True))
        t0 = time.time()
        for p in procs:
            out, err = p.communicate(timeout=900)
            assert p.returncode == 0, f'rc={p.returncode}\n{out}\n{err}'
        return time.time() - t0

    # Warm pass compiles kernel caches so both timed runs see a warm cache.
    run_cohort(1, 'warm')
    t1 = run_cohort(1, 'p1')
    t2 = run_cohort(2, 'p2')
    ratio = t1 / t2
    print(f'[cohort-throughput] 4 samples: 1 process {t1:.1f}s, '
          f'2 processes {t2:.1f}s -> speedup {ratio:.2f}x')
    assert ratio > 0.8, (
        f'2-process cohort slower than 1-process beyond tolerance: {ratio:.2f}x')
