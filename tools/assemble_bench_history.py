#!/usr/bin/env python3
"""Assemble bench_history_r{N}.json from Bench log files and refresh
bench_baseline.json (the per-query regression gate) from the named runs.

Usage: python3 tools/assemble_bench_history.py <round> <log> [<log> ...]
Each log is a `sbt "runMain graft.Bench"` capture; the LAST
{"metric":...} line in each is taken as that run's record.
"""
import json
import sys


def last_metric_line(path):
    # Bench prints the FULL record (with the complete "queries" map)
    # followed by a compact tail-window line ("queries_file" sidecar
    # pointer, no full map) — take the last FULL line.
    rec = None
    with open(path, errors="replace") as f:
        for line in f:
            if '"metric"' in line and '"queries":{' in line:
                payload = line.split("] ", 1)[-1].strip()
                try:
                    rec = json.loads(payload)
                except json.JSONDecodeError:
                    continue
    if rec is None:
        raise SystemExit(f"no metric line in {path}")
    return rec


def main():
    rnd = int(sys.argv[1])
    runs = [last_metric_line(p) for p in sys.argv[2:]]
    hist = {
        "round": rnd,
        "runs": runs,
        "note": ("per-query wall seconds, local[32], cold per query after "
                 "prewarm; sf tags: testdata dirs plus the ScaleCorpus 10x "
                 "replication of sf0.1"),
    }
    # never clobber a hand-authored history file (r6+ histories carry
    # narrative sections beyond what this script emits) — append the runs
    # under a keyed section instead
    hist_path = f"bench_history_r{rnd}.json"
    try:
        with open(hist_path) as f:
            existing = json.load(f)
        existing.setdefault("assembled_runs", []).extend(runs)
        hist = existing
    except FileNotFoundError:
        pass
    with open(hist_path, "w") as f:
        json.dump(hist, f, indent=1)
    # baseline: keyed by dir basename; MERGE over the committed file so a
    # single-sf refresh keeps the other tags' entries
    try:
        with open("bench_baseline.json") as f:
            base = json.load(f)  # keeps _provenance and unrefreshed tags
    except FileNotFoundError:
        base = {}
    for r in runs:
        tag = r["sf"].rstrip("/").split("/")[-1]
        # merge WITHIN the tag too: a subset sweep (SPARK_GRAFT_QUERIES)
        # refreshes only the queries it ran, keeping the rest gated
        entries = base.setdefault(tag, {})
        entries.update({k: round(v, 6) for k, v in r["queries"].items()})
        # host-calibration probe rides along so the regression gate can
        # divide out cross-host speed skew (Bench.scala hostRatio)
        if "probe_sec" in r:
            entries["__probe__"] = round(r["probe_sec"], 6)
    with open("bench_baseline.json", "w") as f:
        json.dump(base, f, indent=1)
    for r in runs:
        print(r["sf"], round(r["value"], 1), "s,", len(r["queries"]), "queries")


if __name__ == "__main__":
    main()
