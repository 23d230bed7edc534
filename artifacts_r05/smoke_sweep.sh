#!/bin/bash
# On-chip smoke across kernel knob configs (VERDICT r4 directive #1a)
cd /root/repo
for cfg in "16 128" "32 128" "32 0"; do
  set -- $cfg
  echo "=== SMOKE tile=$1 strip=$2 ==="
  env PYTHONPATH="/root/repo:/root/.axon_site" VCR_TILE=$1 VCR_STRIP_ROWS=$2 \
    python -u scripts/tpu_smoke.py 2>&1
  echo "=== exit=$? tile=$1 strip=$2 ==="
done
