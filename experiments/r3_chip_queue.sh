#!/bin/bash
# Round-3 continuation: one STRICTLY serial chip pipeline (the remote
# compile tunnel tolerates no concurrent clients — CLAUDE.md notes).
# Bounded deliverables first (chain-scaling bench, NUTS profile), then
# the open-ended catalogue queue fills remaining wall time; touch
# results/catalog_r3/STOP to drain the queue cleanly between jobs.
set -u
cd /root/repo
L=results/catalog_r3
mkdir -p "$L" /tmp/mile_tpu_jax_cache

echo "=== chain-scaling airfoil $(date -u +%T)"
timeout 1500 python bench.py --chain-scaling airfoil \
    > "$L/scale_airfoil.jsonl" 2> "$L/scale_airfoil.log"
echo "=== chain-scaling fcn $(date -u +%T)"
timeout 1800 python bench.py --chain-scaling fcn \
    > "$L/scale_fcn.jsonl" 2> "$L/scale_fcn.log"
echo "=== profile_nuts $(date -u +%T)"
timeout 2400 python experiments/profile_nuts.py --draws 200 \
    > "$L/profile_nuts.log" 2>&1
echo "=== catalogue complexity,datasize,nuts_ta $(date -u +%T)"
python experiments/run_catalog.py --only complexity,datasize,nuts_ta \
    --mclmc-first >> "$L/queue_runner.log" 2>&1
echo "=== PIPELINE_DONE $(date -u +%T)"
