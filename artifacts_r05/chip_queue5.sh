#!/bin/bash
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
echo "=== vpu peak v3 (bf16) ==="
python -u scripts/vpu_peak.py
echo "=== 30k full schedule at 800x600 ==="
python -u scripts/tpu_protocol.py --full30k --workdir /tmp/vcr_full30k
echo "=== done ==="
