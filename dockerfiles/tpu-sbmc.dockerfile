# TPU environment for sbmc_tpu (the role of the reference's
# dockerfiles/cuda-sbmc.dockerfile, minus the CUDA/Halide toolchain the
# TPU-native design no longer needs).
#
# Build:  docker build -f dockerfiles/tpu-sbmc.dockerfile -t sbmc-tpu .
# Run  :  docker run --privileged --net=host -v $PWD:/work sbmc-tpu \
#           python -m pytest tests -q -m "not slow"
# On a Cloud TPU VM the host TPU driver is exposed via /dev/accel*;
# --privileged (or the libtpu device mounts) is required for chip access.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential cmake ninja-build liblz4-dev git \
    && rm -rf /var/lib/apt/lists/*

# JAX with the libtpu runtime (CPU fallback works for tests/dev machines).
RUN pip install --no-cache-dir "jax[tpu]" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax

RUN pip install --no-cache-dir flax optax orbax-checkpoint chex einops \
    numpy imageio pytest

WORKDIR /work
COPY . /work
RUN pip install --no-cache-dir -e .

# Smoke: op oracle + bin IO (no TPU needed).
RUN JAX_PLATFORMS=cpu python -c "import sbmc_tpu, sbmc_tpu.ops"

CMD ["python", "-m", "pytest", "tests", "-q", "-m", "not slow"]
