#!/usr/bin/env bash
# Round-5 queue, part 2 (run after r5_chip_queue.sh drains):
#   7. 48-chain production-scale artifact run (VERDICT r4 next 8) +
#      manifest for docs/ARTIFACTS.md
#   8. datasize-NUTS + complexity-48-NUTS fill — attempt ONLY via the
#      mitigation found by the fault probe; the run_catalog harness
#      contains faults (exit 70 + ledger) either way.
set -u
cd "$(dirname "$0")/.."
L=results/catalog_r3
mkdir -p "$L"

run_catalog() {
    local attempt rc
    for attempt in 1 2 3; do
        nice -n 5 python experiments/run_catalog.py --root "$L" "$@"
        rc=$?
        if [ "$rc" -eq 75 ]; then
            echo "=== STOP honored during: $* $(date)"
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
    echo "=== r5 queue p2 start $(date)"
    # stages 7/7b dropped: bike48_warmupcap8 mitigation verify and the
    # one-harness nuts_ta sweep (9 rows, all three ta arms) already ran
    # and are committed (aggr_results/{nuts_fault_probe.jsonl,aggr_nuts_ta.csv})

    echo "--- stage 8: datasize-NUTS fill (warmup trees capped at 8) $(date)"
    run_catalog --only datasize --name-filter nuts

    echo "--- stage 9: complexity 48-width NUTS fill $(date)"
    run_catalog --only complexity --name-filter 'nuts_48x48x48'

    echo "--- stage 10: merge new NUTS rows into pooled CSVs $(date)"
    python experiments/pool_results.py results/catalog_r3/datasize \
        -o /tmp/pool_datasize_r5.csv || true
    python experiments/pool_results.py results/catalog_r3/complexity \
        -o /tmp/pool_complexity_r5.csv || true
    python - <<'PY' || true
import pandas as pd
for study in ('datasize', 'complexity'):
    old = pd.read_csv(f'aggr_results/aggr_{study}.csv')
    try:
        new = pd.read_csv(f'/tmp/pool_{study}_r5.csv')
    except Exception:
        continue
    merged = (pd.concat([old, new], ignore_index=True)
              .drop_duplicates(subset='experiment_dir', keep='last'))
    merged.to_csv(f'aggr_results/aggr_{study}.csv', index=False)
    print(study, 'rows:', len(old), '->', len(merged))
PY

    echo "--- stage 11: 48-chain artifact run $(date)"
    rm -rf results/repl_uci/mclmc_48
    nice -n 5 python train.py -c configs/replicate_uci/mclmc_48.yaml
    python experiments/make_manifest.py results/repl_uci/mclmc_48 \
        > aggr_results/manifest_mclmc_48.md || true
    grep -E 'LPPD|time\.' results/repl_uci/mclmc_48/training.log || true

    echo "=== r5 queue p2 complete $(date)"
    echo PIPELINE_DONE_R5P2
} >> "$L/r5_queue.log" 2>&1
