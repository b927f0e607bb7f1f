# Container image for ann3depth_tpu (ops parity with the reference's
# Dockerfile, SURVEY §2.1 "Ops scripts") — targets Cloud TPU VMs.
#
# Note: this build needs network access; in the offline development
# environment the image is documentation of the runtime contract.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY . /app

# TPU-enabled JAX + the framework's dependency surface
# (versions mirror the verified environment, SURVEY §2.4 [ENV]).
RUN pip install --no-cache-dir \
        "jax[tpu]>=0.9.0" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        "flax>=0.12" "optax>=0.2.6" "orbax-checkpoint>=0.11" "grain>=0.2.15" \
        opencv-python-headless pillow scipy h5py pytest

# prebuild the native ring buffer
RUN make native

ENTRYPOINT ["python", "-m", "ann3depth_tpu"]
CMD ["--help"]
