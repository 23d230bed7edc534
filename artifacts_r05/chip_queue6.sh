#!/bin/bash
# Final protocol headline block (VERDICT r4 next #4): one same-window
# session — pre-staged vs staged-cams at dtu_full, the trained-population
# staged rate, and the dev round metric.
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
echo "=== smoke (bwd CSE change) ==="
python -u scripts/tpu_smoke.py 2>&1 | tail -5
echo "=== microprobe unroll ==="
python -u scripts/kernel_microprobe.py --variants full,dma_only,full_u3,full_u6,dma_u6 2>&1 | tail -30
echo "=== protocol headline block ==="
for mode in "pre" "staged" "pre" "staged"; do
  echo "--- dtu_full $mode ---"
  if [ "$mode" = "staged" ]; then
    python bench.py --preset dtu_full --staged_cams 2>/dev/null
  else
    python bench.py --preset dtu_full 2>/dev/null
  fi
done
echo "--- trained population, staged cams ---"
python bench.py --cfg_path /tmp/vcr_trainpop/run/config.yaml --staged_cams 2>/dev/null
echo "--- trained population, pre-staged ---"
python bench.py --cfg_path /tmp/vcr_trainpop/run/config.yaml 2>/dev/null
echo "--- dev (round metric) ---"
python bench.py 2>/dev/null
echo "=== done ==="
