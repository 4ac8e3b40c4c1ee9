"""Render the round's current-state table from the measurement log.

Every benchmark/probe emit() appends to benchmarks/RESULTS_r05.jsonl; this
script groups by (config, metric, qualifiers), keeps the LATEST TPU record
of each, and prints one markdown block. BASELINE.md's round block and the
docs/PERF.md header paste this output verbatim, so steady-state numbers
cannot drift between documents (round-4 verdict weak #7).

bench.py's own artifact does not flow through emit(); pass its JSON line on
stdin or with --bench '<json>' to include the headline row.

Usage: python benchmarks/current_state.py [--log RESULTS_r05.jsonl]
       [--bench '{"metric": ...}']
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path


def load_latest(log_path: Path, backend: str = "tpu") -> dict:
    latest = {}
    if not log_path.exists():
        return latest
    for line in log_path.read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        rec = json.loads(line)
        if rec.get("_backend") not in (backend, None, "unknown"):
            continue
        key = (
            rec.get("config"),
            rec.get("metric"),
            rec.get("phase"),
            rec.get("impl"),
            rec.get("variant"),
        )
        latest[key] = rec  # file order is chronological: last wins
    return latest


def render(latest: dict, bench: dict | None) -> str:
    rows = []
    if bench:
        rows.append(
            (
                "35k bunny pair (15 iters, r=0.075, k=20), `bench.py`",
                f"**{bench['value']} pairs/s = "
                f"{bench.get('vs_baseline', '?')}x** (spread "
                f"{'-'.join(str(s) for s in bench.get('spread', []))}, "
                f"roundtrip {bench.get('roundtrip_ms', '?')} ms, "
                f"inner_cap_hits {bench.get('inner_cap_hits', '?')})",
            )
        )

    def get(config, metric, **quals):
        return latest.get(
            (
                config,
                metric,
                quals.get("phase"),
                quals.get("impl"),
                quals.get("variant"),
            )
        )

    r = get("kitti131k_pair", "pair_seconds")
    if r:
        rows.append(
            (
                "KITTI-like 131k full-res pair (10 iters, r=0.5)",
                f"warm {r['value']} s/pair (engine {r.get('engine')}, "
                f"inner_cap_hits {r.get('inner_cap_hits', '?')})",
            )
        )
    r = get("kitti131k_pool_search", "search_ms_per_iter", impl="loop")
    if r:
        rows.append(
            (
                "KITTI loop-timed pooled search (product/demand budget)",
                f"{r['value']} ms/iter (repeats "
                f"{'/'.join(str(t) for t in r.get('all_times', []))})",
            )
        )
    r = get("kitti131k_ctor_breakdown", "seconds")
    if r:
        p = r.get("phases_best", {})
        total = sum(p.values())
        rows.append(
            (
                "KITTI warm single-pair prep (grid+plan+demand+upload/build)",
                f"{total:.2f} s ({', '.join(f'{k} {v}' for k, v in p.items())};"
                f" seeds {r.get('seed_mb', '?')} MB)",
            )
        )
    for phase in ("cold", "steady"):
        r = get("sequence:kitti_like", "scan_pairs_per_s", phase=phase)
        if r:
            rows.append(
                (
                    f"KITTI-like full-res sequence, {phase} "
                    "(bench_sequence --kitti_like)",
                    f"{r['value']} pairs/s over {r.get('n_pairs')} pairs "
                    f"(inner_cap_hits {r.get('inner_cap_hits', '?')})",
                )
            )
    out = ["| Config | value |", "|---|---|"]
    out += [f"| {a} | {b} |" for a, b in rows]
    return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default=None)
    ap.add_argument("--bench", default=None,
                    help="bench.py's JSON line (its artifact bypasses emit)")
    args = ap.parse_args()
    log = Path(args.log) if args.log else Path(__file__).parent / "RESULTS_r05.jsonl"
    bench = json.loads(args.bench) if args.bench else None
    print(render(load_latest(log), bench))


if __name__ == "__main__":
    main()
