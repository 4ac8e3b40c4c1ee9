#!/bin/bash
# Round-5 measurement battery: run SOLO (no concurrent pytest/probes —
# host contention corrupts the host-phase timings). Appends every record
# to RESULTS_r05.jsonl via emit(); bench.py's line is captured separately
# and passed to current_state.py.
set -e
cd "$(dirname "$0")"

echo "== bench.py (headline) =="
(cd .. && python bench.py 2>/dev/null | tee /tmp/bench_r05.json)

echo "== KITTI pair =="
python bench_kitti.py 2>/dev/null | tail -1

echo "== KITTI loop-timed search (product budget) =="
python probe_search.py --fixture kitti --demand_budget 2>/dev/null | tail -1

echo "== KITTI ctor breakdown =="
python probe_ctor.py --fixture kitti --points 131072 --iters 10 2>/dev/null | tail -1

echo "== bunny ctor breakdown =="
python probe_ctor.py 2>/dev/null | tail -1

echo "== KITTI-like full-res sequence =="
python bench_sequence.py --kitti_like 2>/dev/null | tail -2

echo "== current-state table =="
python current_state.py --bench "$(cat /tmp/bench_r05.json)"
