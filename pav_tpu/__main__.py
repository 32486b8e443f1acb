"""Command-line entry: python -m pav_tpu --ref ref.fa --assemblies asm.tsv

The CLI analog of the reference's runlocal/snakemake invocation
(NATIVE_INSTALL.md:68-116): one process, one engine, VCF per sample.
"""

import argparse
import json
import sys

from .pipeline import run


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog='pav_tpu',
        description='TPU-native assembly-to-reference variant calling engine')
    parser.add_argument('--ref', required=True, help='Reference FASTA')
    parser.add_argument('--assemblies', required=True,
                        help='Assembly table TSV/CSV (NAME + HAP_* columns)')
    parser.add_argument('--config', default=None, help='config.json path')
    parser.add_argument('--run-dir', default='pav_run', help='Artifact directory')
    parser.add_argument('--sample', action='append', default=None,
                        help='Run only this sample (repeatable)')
    parser.add_argument('--set', action='append', default=[], metavar='KEY=VAL',
                        help='Config override (repeatable)')
    parser.add_argument('--resume', action='store_true',
                        help='Resume from stage artifacts in the run dir')
    parser.add_argument('--profile-dir', default=None,
                        help='Write a JAX profiler trace here')
    args = parser.parse_args(argv)

    # Engine processes churn large short-lived buffers; keeping freed pages in
    # the heap avoids munmap/refault cycles (critical on lazily-restored VMs).
    from .runtime import retain_heap
    retain_heap(0)

    overrides = {}
    if args.config:
        with open(args.config) as fh:
            overrides.update(json.load(fh))
    for item in args.set:
        key, _, val = item.partition('=')
        overrides[key] = val

    results = run(args.ref, args.assemblies, config=overrides,
                  run_dir=args.run_dir, samples=args.sample,
                  resume=args.resume, profile_dir=args.profile_dir)
    for asm_name, res in results.items():
        print(f'{asm_name}: {res["vcf"]}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
