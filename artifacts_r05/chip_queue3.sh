#!/bin/bash
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
echo "=== kernel microprobe ==="
python -u scripts/kernel_microprobe.py
echo "=== 7k rehearsal (REHEARSAL_r05 candidate) ==="
python -u scripts/tpu_protocol.py --workdir /tmp/vcr_protocol_r05
echo "=== done ==="
