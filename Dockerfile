# Container packaging for pav_tpu (reference analog: /root/reference/Dockerfile:1-81
# + files/run_scripts/runlocal.sh — Snakemake + native deps baked into an image).
# Here the engine is one Python package; the only native piece builds itself
# from the bundled sources at first use (pav_tpu/native.py).
#
# Build:  docker build -t pav-tpu .
# Run:    docker run --rm -v $PWD:/work pav-tpu \
#             --ref /work/ref.fa --assemblies /work/assemblies.tsv \
#             --run-dir /work/pav_run
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

# CPU JAX by default; swap for the TPU wheel on TPU VMs
# (pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html).
RUN pip install --no-cache-dir jax numpy pandas matplotlib

WORKDIR /opt/pav-tpu
COPY pyproject.toml README.md ./
COPY pav_tpu ./pav_tpu
COPY native ./native
RUN pip install --no-cache-dir --no-build-isolation --no-deps -e .

ENTRYPOINT ["pav-tpu"]
CMD ["--help"]
