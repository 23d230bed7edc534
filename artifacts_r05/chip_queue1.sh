#!/bin/bash
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
echo "=== dev bench strip A/B (interleaved) ==="
for s in 0 128 0 128; do
  echo "--- VCR_STRIP_ROWS=$s ---"
  env VCR_STRIP_ROWS=$s python bench.py 2>/dev/null
done
echo "=== vpu peak ==="
python -u scripts/vpu_peak.py
echo "=== done ==="
