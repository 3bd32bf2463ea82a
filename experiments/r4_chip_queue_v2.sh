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
    nice -n 5 python experiments/run_catalog.py --root "$L" "$@"
    local rc=$?
    if [ "$rc" -eq 75 ]; then
        echo "=== STOP honored during: $* — pipeline drained $(date)"
        exit 75
    fi
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
