# Client image (parity: docker/Client.dockerfile).
FROM python:3.12-slim

WORKDIR /app

RUN apt-get update && apt-get install -y --no-install-recommends curl \
    && rm -rf /var/lib/apt/lists/*

COPY pyproject.toml README.md ./
COPY fl_tpu ./fl_tpu
COPY proto ./proto
COPY config ./config

RUN pip install --no-cache-dir . grpcio protobuf psutil

COPY docker/client-entrypoint.sh /entrypoint.sh
RUN chmod +x /entrypoint.sh
ENTRYPOINT ["/entrypoint.sh"]
