#!/usr/bin/env bash
# Round-4 queue, part 2: remaining studies reordered so that complete
# cheap grids land before the expensive datasize-NUTS block (protein
# NUTS ≈ 10-13 min/run; running it last means a clock overrun costs
# seed coverage, not whole studies). Same serial/no-timeout/STOP rules
# as r4_chip_queue.sh.
set -u
cd "$(dirname "$0")/.."
L=results/catalog_r3
mkdir -p "$L"
rm -f "$L/STOP"
run() {
    # up to 3 attempts per stage: exit 70 = device fault killed the
    # process (run_catalog bails out; a fresh process resumes via the
    # skip logic). Failed jobs left no metrics.pkl so they re-run.
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
    echo "=== r4 queue v2 start $(date)"
    run --only datasize --name-filter mclmc        # 10 cheap cells left
    run --only complexity --mclmc-first            # 12 DE + 12 NUTS
    run --only feasibility                         # feas_tuned companions
    run --only datasize --name-filter 'nuts.*_r1$' # 1-seed NUTS axis
    run --only datasize --mclmc-first              # remaining NUTS seeds
    echo "=== r4 v2 complete $(date)"
    echo PIPELINE_DONE_V2
} >> "$L/r4_queue.log" 2>&1
