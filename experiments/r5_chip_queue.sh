#!/usr/bin/env bash
# Round-5 chip queue (VERDICT r4 "next" items, priority order):
#   1. bench.py — recapture the headline number FIRST (round 4's official
#      record is a crash; don't let a later wedge cost it again)
#   2. NUTS fault probe: repro + width/datapoint bisect, then mitigations
#   3. nuts_ta study re-run (3 ta values x 3 seeds, one harness — makes
#      aggr_nuts_ta.csv self-contained)
#   4. dtype_ab study (airfoil LPPD under 3 matmul-dtype policies)
#   5. wide-FCN dtype A/B (tuned-params drift + MFU)
#   6. datasize-NUTS fill — only attempted when the probe found a
#      mitigation that runs protein-NUTS without faulting
# Strictly serial; same exit-70 retry/cool-off rules as r4.
set -u
cd "$(dirname "$0")/.."
L=results/catalog_r3
mkdir -p "$L" aggr_results
rm -f "$L/STOP"

run_catalog() {
    local attempt rc
    for attempt in 1 2 3; do
        nice -n 5 python experiments/run_catalog.py --root "$L" "$@"
        rc=$?
        if [ "$rc" -eq 75 ]; then
            echo "=== STOP honored during: $* — pipeline drained $(date)"
            exit 75
        fi
        if [ "$rc" -ne 70 ]; then
            return 0
        fi
        echo "=== device fault during: $* (attempt $attempt); cooling off 180s $(date)"
        sleep 180
    done
    echo "=== stage abandoned after repeated device faults: $* $(date)"
    return 0
}

{
    echo "=== r5 queue start $(date)"

    echo "--- stage 1: bench $(date)"
    nice -n 5 python bench.py | tee /tmp/bench_r5_headline.json
    cp /tmp/bench_r5_headline.json aggr_results/bench_r5_headline.json || true

    echo "--- stage 2: NUTS fault repro + bisect $(date)"
    nice -n 5 python experiments/nuts_fault_probe.py --repro --bisect

    echo "--- stage 3: NUTS fault mitigations $(date)"
    nice -n 5 python experiments/nuts_fault_probe.py --mitigations

    echo "--- stage 4: nuts_ta study $(date)"
    run_catalog --only nuts_ta
    python experiments/pool_results.py "$L/nuts_ta" \
        -o aggr_results/aggr_nuts_ta.csv || true

    echo "--- stage 5: dtype_ab study $(date)"
    run_catalog --only dtype_ab
    python experiments/pool_results.py "$L/dtype_ab" \
        -o aggr_results/aggr_dtype_ab.csv || true

    echo "--- stage 6: wide-FCN dtype A/B $(date)"
    nice -n 5 python experiments/dtype_ab_widefcn.py

    echo "=== r5 queue complete $(date)"
    echo PIPELINE_DONE_R5
} >> "$L/r5_queue.log" 2>&1
