# TPU-host container for beatheritage_tpu (run on a Cloud TPU VM; the TPU
# runtime is reached through /dev and the libtpu bundled with jax[tpu]).
# (reference: Dockerfile builds a CUDA/torch image; this is the TPU analogue.)
FROM python:3.12-slim

# system codecs used by the native audio decoder (dlopen'd at runtime) and
# the C++ toolchain to build it
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ libmpg123-0 libvorbisfile3 libmp3lame0 libvorbisenc2 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY beatheritage_tpu ./beatheritage_tpu
COPY configs ./configs
ENV BEATHERITAGE_CONFIG_DIR=/app/configs

RUN pip install --no-cache-dir -e .[tpu,train] \
    && python -m beatheritage_tpu.native.build

# persistent XLA compile cache across container restarts. Compiles cannot
# run at image build (no TPU); warm the AOT executable cache once per
# deployment so every later process starts cold-start-free:
#   docker run ... beatheritage_tpu python -m beatheritage_tpu.apps.warmup \
#       -cn beatheritage_v1 model_path=/models/flagship_ckpt
ENV JAX_COMPILATION_CACHE_DIR=/cache/jax
ENV BH_AOT_CACHE=/cache/aot
VOLUME ["/cache", "/models", "/data"]

EXPOSE 9727
ENTRYPOINT ["beatheritage"]
CMD ["--help"]
