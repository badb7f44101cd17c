# Container image for graph-hscn-tpu (parity with the reference's Docker
# packaging, reference Dockerfile + .github/workflows/build-and-push.yml;
# here the image also builds the native batcher and runs the test suite).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
COPY graph_hscn_tpu ./graph_hscn_tpu
COPY native ./native
COPY configs ./configs
COPY main.py bench.py ./

RUN pip install --no-cache-dir . pytest && make -C native

# CPU JAX by default; swap for the TPU wheel on TPU VMs:
#   pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

ENTRYPOINT ["python", "main.py"]
CMD ["--cfg", "configs/GCN/peptides_func_GCN.yaml"]
