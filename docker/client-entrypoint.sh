#!/bin/sh
# Client entrypoint (parity: docker/client-entrypoint.sh — auto-generate
# CLIENT_ID when unset (ref :13-17), wait for coordinator health, start).
set -e

if [ -z "$CLIENT_ID" ]; then
    CLIENT_ID="client_$(head -c4 /dev/urandom | od -An -tx1 | tr -d ' \n')"
    export CLIENT_ID
    echo "generated CLIENT_ID=$CLIENT_ID"
fi

HOST="${COORDINATOR_HOST:-coordinator}"
HTTP_PORT="${COORDINATOR_HTTP_PORT:-8080}"
echo "waiting for coordinator at $HOST:$HTTP_PORT ..."
for i in $(seq 1 60); do
    if curl -sf "http://$HOST:$HTTP_PORT/health" > /dev/null 2>&1; then
        break
    fi
    sleep 2
done

exec fl-client --config "${CONFIG_PATH:-config/client.yaml}"
