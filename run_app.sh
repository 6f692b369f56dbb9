#!/bin/sh
# One-click launcher (reference parity: run_app.bat).
cd "$(dirname "$0")"
exec python -m siggan_tpu.cli.app --port 8501 "$@"
