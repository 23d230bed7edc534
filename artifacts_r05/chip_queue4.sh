#!/bin/bash
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
echo "=== 7k rehearsal rerun (warm compile cache) ==="
python -u scripts/tpu_protocol.py --workdir /tmp/vcr_protocol_r05b
echo "=== microprobe bisect ==="
for v in dma_only no_exp full no_tri no_dacc no_depth; do
  echo "--- variant $v ---"
  python -u scripts/kernel_microprobe.py --variants $v 2>&1 | tail -8
done
echo "=== microprobe full (interleaved, if none crashed) ==="
python -u scripts/kernel_microprobe.py 2>&1 | tail -40
echo "=== done ==="
