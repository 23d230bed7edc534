#!/bin/bash
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
echo "=== vpu peak v2 ==="
python -u scripts/vpu_peak.py
echo "=== camcache A/B ==="
python -u scripts/ab_camcache_r05.py
echo "=== done ==="
