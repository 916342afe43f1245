# brats21_tpu — TPU-native BraTS 2021 segmentation framework.
#
# Parity with the reference Dockerfile (reference Dockerfile:1-65): the image
# entrypoint runs ensemble inference with TTA + post-processing over a
# mounted case directory. CUDA/conda machinery is replaced by a JAX TPU
# image; trained config dirs are baked under /workspace/models.

FROM python:3.11-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential zlib1g-dev make && rm -rf /var/lib/apt/lists/*

# TPU-enabled jax; swap the extra for your libtpu channel as needed
RUN pip install --no-cache-dir "jax[tpu]" flax optax orbax-checkpoint \
    chex einops numpy scipy scikit-learn pyyaml pandas tensorboardX

WORKDIR /workspace
COPY brats21_tpu ./brats21_tpu
COPY native ./native
COPY pyproject.toml bench.py ./
RUN make -C native && pip install --no-cache-dir -e .

# mount points: /input (flat case dir), /output (segmentations),
# /workspace/models/<run>/config.yaml+checkpoints (ensemble members)
ENTRYPOINT ["python", "-m", "brats21_tpu.cli.main_inference", \
    "--on", "test", "--docker_test", \
    "--input", "/input", "--output", "/output", \
    "--tta", "--replace_value", "--replace_value_threshold", "300", \
    "--cleaning_areas", "--cleaning_areas_threshold", "20"]
# append --config /workspace/models/*/config.yaml at `docker run` time
