# MygramDB-TPU serving image.
#
# The runtime expects a TPU-attached host (jax[tpu]); for CPU-only smoke
# runs the engine transparently falls back to the XLA CPU backend.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY mygramdb_tpu ./mygramdb_tpu
COPY native ./native
COPY examples ./examples

# core deps (jax[tpu] must match the host TPU runtime; override as needed)
ARG JAX_SPEC="jax[tpu]"
RUN pip install --no-cache-dir numpy pyyaml msgpack aiohttp "${JAX_SPEC}" \
    && pip install --no-cache-dir -e . \
    && make -C native

VOLUME /var/lib/mygramdb/dumps
EXPOSE 11016 8080

ENTRYPOINT ["mygramdb-tpu"]
CMD ["--config", "/etc/mygramdb/config.yaml"]
