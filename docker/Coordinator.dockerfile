# Coordinator image (parity: docker/Coordinator.dockerfile — python-slim
# base, EXPOSE 50051/8080/9090, curl health check). The TPU build targets a
# TPU-VM host image in production; this slim image serves the CPU/dev path.
FROM python:3.12-slim

WORKDIR /app

RUN apt-get update && apt-get install -y --no-install-recommends curl \
    && rm -rf /var/lib/apt/lists/*

COPY pyproject.toml README.md ./
COPY fl_tpu ./fl_tpu
COPY proto ./proto
COPY config ./config

RUN pip install --no-cache-dir . grpcio protobuf psutil

EXPOSE 50051 8080 9090

HEALTHCHECK --interval=30s --timeout=5s --retries=3 \
    CMD curl -sf http://localhost:8080/health || exit 1

COPY docker/coordinator-entrypoint.sh /entrypoint.sh
RUN chmod +x /entrypoint.sh
ENTRYPOINT ["/entrypoint.sh"]
