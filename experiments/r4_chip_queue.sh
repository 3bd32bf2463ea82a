#!/usr/bin/env bash
# Round-4 study queue: the remaining reference studies (VERDICT r3 next 1,
# 3, 4), strictly serial on the one chip, NO external timeouts — killing a
# client mid-remote-compile wedges the tunnel ~30 min (ADVICE r3 low).
# Cooperative drain: `touch results/catalog_r3/STOP` stops between jobs;
# the runner consumes the file and exits 75, which stops the pipeline.
#
# Root stays catalog_r3 so the 17 surviving complexity/datasize run dirs
# are skipped instead of re-run.
set -u
cd "$(dirname "$0")/.."
L=results/catalog_r3
mkdir -p "$L"
rm -f "$L/STOP"   # stale drain marker from a previous session
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
    echo "=== r4 queue start $(date)"
    # priority order per VERDICT r3: zero-coverage studies first
    run --only feasibility
    run --only diagnostics --mclmc-first
    run --only nuts_ta
    run --only dataset
    run --only datasize --mclmc-first
    run --only complexity --mclmc-first
    echo "=== all studies complete $(date)"
    echo PIPELINE_DONE
} >> "$L/r4_queue.log" 2>&1
