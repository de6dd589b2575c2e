#!/bin/sh
# Coordinator entrypoint (parity: docker/coordinator-entrypoint.sh — wait
# for the database when configured, init schema, start the service).
set -e

if [ -n "$DATABASE_URL" ]; then
    echo "initializing database schema at $DATABASE_URL"
    python -c "from fl_tpu.services.database import init_database; \
init_database('$DATABASE_URL')"
fi

exec fl-coordinator --config "${CONFIG_PATH:-config/coordinator.yaml}"
