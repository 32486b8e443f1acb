"""Multi-host distribution: share-nothing sample/haplotype fan-out across
processes with jax.distributed coordination.

The reference distributes pipeline rules across a cluster through Snakemake
profiles (NATIVE_INSTALL.md:68-103, profiles/default/config.yaml): every job is
share-nothing and files are the interchange. The TPU-native mapping keeps that
shape at the top level — each host process owns a deterministic shard of the
sample table and runs the full engine on its local chip(s), with the
device-mesh layer (parallel.mesh) sharding batched kernels inside each host —
and replaces the filesystem rendezvous with the jax.distributed coordination
service: a key-value store for artifact exchange and named barriers for stage
fences.

Works on any backend (the coordination service is backend-independent), so the
cohort path is testable on CPU hosts without TPU pods; on a pod slice, each
host's engine additionally shards DP batches over its local mesh.
"""

import json

import numpy as np


def init(coordinator, num_processes, process_id):
    """Initialize jax.distributed for a cohort run.

    :param coordinator: 'host:port' of process 0.
    """
    import jax

    jax.distributed.initialize(coordinator, num_processes, process_id)
    return Cohort(num_processes, process_id)


def shard_samples(sample_names, process_id, num_processes):
    """Deterministic round-robin shard of the sample table (the reference's
    per-sample cluster fan-out: one wildcard job per sample)."""
    return [s for i, s in enumerate(sorted(sample_names))
            if i % num_processes == process_id]


class Cohort:
    """Cross-process coordination for a sharded cohort run."""

    def __init__(self, num_processes, process_id):
        from jax._src import distributed

        self.num_processes = int(num_processes)
        self.process_id = int(process_id)
        self._client = distributed.global_state.client
        if self._client is None:
            raise RuntimeError('jax.distributed is not initialized')

    # -------------------------------------------------------------- barriers

    def barrier(self, name, timeout_s=600):
        """All processes wait at a named fence (stage edge)."""
        self._client.wait_at_barrier(str(name), timeout_s * 1000)

    # ------------------------------------------------------------- exchange

    def publish(self, key, obj):
        """Publish a JSON-serializable object under a namespaced key."""
        self._client.key_value_set(f'pav/{key}', json.dumps(obj))

    def fetch(self, key, timeout_s=600):
        """Blocking fetch of a published object."""
        val = self._client.blocking_key_value_get(
            f'pav/{key}', timeout_s * 1000)
        return json.loads(val)

    def allgather_obj(self, name, obj, timeout_s=600):
        """Gather one JSON-serializable object per process, ordered by
        process id (the cross-host reduction that replaces the reference's
        per-sample file concatenation)."""
        self.publish(f'{name}/{self.process_id}', obj)
        return [self.fetch(f'{name}/{p}', timeout_s)
                for p in range(self.num_processes)]


def run_cohort(cohort, ref_store, assemblies, run_dir, config=None, log=None):
    """Run the engine on this process's sample shard; gather the cohort
    manifest (sample -> VCF path + per-type call counts) on every process.

    :param assemblies: {sample: {hap: SeqStore}} for the WHOLE cohort; each
        process runs only its shard.
    :return: manifest dict for all samples across all processes.
    """
    import os

    from ..pipeline import Pipeline

    mine = shard_samples(list(assemblies), cohort.process_id,
                         cohort.num_processes)
    pipeline = Pipeline(ref_store, config or {}, run_dir=run_dir, log=log)
    local = {}
    for sample in mine:
        result = pipeline.run_sample(sample, assemblies[sample])
        counts = {f'{t}_{tier}': int(df.shape[0])
                  for (t, tier), df in result['merged'].items()}
        local[sample] = {
            'vcf': os.path.join(run_dir, f'{sample}.vcf.gz'),
            'process': cohort.process_id,
            'counts': counts,
        }
    shards = cohort.allgather_obj('cohort_manifest', local)
    manifest = {}
    for shard in shards:
        manifest.update(shard)
    cohort.barrier('cohort_done')
    return manifest
