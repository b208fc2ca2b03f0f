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
        # idempotent append: re-running with an already-recorded log must
        # not duplicate its run entry
        recorded = existing.setdefault("assembled_runs", [])
        recorded.extend(r for r in runs if r not in recorded)
        hist = existing
    except FileNotFoundError:
        pass
    with open(hist_path, "w") as f:
        json.dump(hist, f, indent=1)
    # baseline: keyed by dir basename; MERGE over the committed file so a
    # single-sf refresh keeps the other tags' entries.
    #
    # REFRESH RULE (r14): one designated FULL sweep per tag per refresh —
    # never hand-min-merge two sweeps into a tag (each query keeps its
    # luckiest run; the next honest sweep then reads 1.3-1.5x phantom
    # flags). If two logs for the same tag are passed, the LAST one wins
    # wholesale. Each full refresh stamps __host__ so cross-container
    # flags are identifiable as weak evidence.
    try:
        with open("bench_baseline.json") as f:
            base = json.load(f)  # keeps _provenance and unrefreshed tags
    except FileNotFoundError:
        base = {}
    import platform

    host_id = f"{platform.node()}/{len(__import__('os').sched_getaffinity(0))}cpu"
    for r in runs:
        tag = r["sf"].rstrip("/").split("/")[-1]
        # r15 probe hygiene: UNRELIABLE now means the probe band widened
        # DURING the sweep (max/min > 1.4 — a stall window; timings are
        # mutually inconsistent) and MUST NOT become the regression gate.
        # It still lands in the history file above (receipts), just not
        # in the baseline. "ok_scaled_host" (stable probes on a host
        # uniformly slower/faster than the baseline host) IS refreshable:
        # a full refresh replaces __probe__ with the new host's probe, so
        # the gate's normalization stays self-consistent.
        if r.get("reliability") == "UNRELIABLE":
            print(f"{r['sf']}: reliability=UNRELIABLE "
                  f"(probe band [{r.get('probe_min')}, {r.get('probe_max')}])"
                  " — history only, baseline NOT refreshed")
            continue
        if r.get("reliability") == "ok_scaled_host":
            print(f"{r['sf']}: stable sweep on a scaled host "
                  f"(host_ratio {r.get('host_ratio')}) — refreshing with "
                  "the new __probe__")
        # merge WITHIN the tag too: a subset sweep (SPARK_GRAFT_QUERIES)
        # refreshes only the queries it ran, keeping the rest gated
        entries = base.setdefault(tag, {})
        old_probe = entries.get("__probe__")
        new_probe = r.get("probe_sec")
        old_keys = set(entries) - {"__probe__", "__host__"}
        full = not old_keys or len(set(r["queries"]) & old_keys) >= \
            0.9 * len(old_keys)
        # A tag's times must all be in ONE host's units or the gate's
        # single hostRatio mis-scales the unrefreshed ones. A full
        # refresh replaces everything including __probe__; a SUBSET run
        # is converted into the baseline host's units — preferably via
        # the MEDIAN per-query ratio against the existing entries (the
        # probe proved non-representative across containers: 2.5x probe
        # skew at ~1.0x query speed, r15), falling back to the probe
        # ratio when too few common stable queries exist.
        scale = 1.0
        if not full:
            ratios = sorted(
                entries[k] / v for k, v in r["queries"].items()
                if k in entries and not k.startswith("__")
                and v > 0.3 and entries[k] > 0.3)
            if len(ratios) >= 8:
                scale = ratios[len(ratios) // 2]
            elif old_probe and new_probe:
                scale = old_probe / new_probe
        entries.update(
            {k: round(v * scale, 6) for k, v in r["queries"].items()})
        # host-calibration probe rides along so the regression gate can
        # divide out cross-host speed skew (Bench.scala hostRatio)
        if new_probe and (full or not old_probe):
            entries["__probe__"] = round(new_probe, 6)
        if full:
            entries["__host__"] = host_id
    with open("bench_baseline.json", "w") as f:
        json.dump(base, f, indent=1)
    for r in runs:
        print(r["sf"], round(r["value"], 1), "s,", len(r["queries"]), "queries")


if __name__ == "__main__":
    main()
