# REST segmentation backend (CPU jax; swap the base/extras for TPU VMs)
FROM python:3.12-slim

WORKDIR /app
COPY pyproject.toml README.md ./
COPY deadtrees_tpu ./deadtrees_tpu
COPY native ./native

RUN pip install --no-cache-dir "jax[cpu]" fastapi uvicorn pillow && \
    pip install --no-cache-dir -e . && \
    (apt-get update && apt-get install -y --no-install-recommends g++ make \
     && make -C native && apt-get purge -y g++ make && apt-get autoremove -y \
     && rm -rf /var/lib/apt/lists/* || echo "native lib skipped")

EXPOSE 8000
CMD ["python", "-m", "deadtrees_tpu.serve.server", \
     "--checkpoint", "checkpoints/bestmodel.ckpt", "--port", "8000"]
