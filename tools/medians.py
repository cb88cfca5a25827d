#!/usr/bin/env python3
"""Assemble a BENCH_MEDIANS artifact from N graft.Bench run files.

Usage: medians.py <run_dir> <out.json> [prev_medians.json]

Each run file is one graft.Bench JSON line (bench_schema 2: per-query
minima in "queries", medians in "queries_median", first pass in
"queries_first"). The artifact reports, per query, the MIN over every
rep of every run (the host-noise-free envelope — the established
discipline on this box: identical code has varied 1.7-5x under stall
windows, so only minima are comparable round-over-round) plus the
quiet-run medians (the run with the lowest median_total), and carries
the per-query semantic version map so a workload change is never
silently compared against its predecessor.

If a previous medians artifact is given, queries whose envelope moved
>1.5x in either direction (same semantic version only) are listed in
"regressions" for the round log.
"""
import json
import pathlib
import statistics
import sys


def main() -> None:
    run_dir, out_path = pathlib.Path(sys.argv[1]), sys.argv[2]
    prev = json.load(open(sys.argv[3])) if len(sys.argv) > 3 else None

    runs = {}
    for p in sorted(run_dir.glob("run_*.json")):
        d = json.loads(p.read_text())
        if d.get("bench_schema") != 2:
            raise SystemExit(f"{p}: bench_schema != 2")
        if d.get("failed"):
            raise SystemExit(f"{p}: has failed queries: {d['errors']}")
        runs[p.name] = d
    if not runs:
        raise SystemExit(f"no run_*.json under {run_dir}")

    names = sorted(next(iter(runs.values()))["queries"])
    for name, d in runs.items():
        if sorted(d["queries"]) != names:
            raise SystemExit(f"{name}: query inventory differs")

    envelope = {q: round(min(d["queries"][q] for d in runs.values()), 3)
                for q in names}
    quiet_name = min(runs, key=lambda n: runs[n]["median_total"])
    quiet = runs[quiet_name]
    medians = {q: round(quiet["queries_median"][q], 3) for q in names}

    # shared-derivation costs (session-cached canon/token/shingle/
    # quantizer builds): min across runs = the noise-free envelope,
    # quiet-run value rides along — same discipline as the queries
    dnames = sorted(quiet.get("derivations_sec", {}))
    for name, d in runs.items():
        if sorted(d.get("derivations_sec", {})) != dnames:
            raise SystemExit(f"{name}: derivation inventory differs")
    deriv_min = {k: round(min(d["derivations_sec"][k] for d in runs.values()), 3)
                 for k in dnames}
    deriv_quiet = {k: round(quiet["derivations_sec"][k], 3) for k in dnames}

    art = {
        "bench_schema": 2,
        "sf": quiet["sf"],
        "cpus": 32,
        "runs": len(runs),
        "reps": sum(d["reps"] for d in runs.values()),
        "quiet_run": quiet_name,
        "min_envelope_total_sec": round(sum(envelope.values()), 3),
        "median_total_sec": round(quiet["median_total"], 3),
        "first_pass_total_sec": round(quiet["first_total"], 3),
        "run_totals": {n: {"min_total": round(sum(d["queries"].values()), 3),
                           "median_total": round(d["median_total"], 3),
                           "first_total": round(d["first_total"], 3)}
                       for n, d in runs.items()},
        "query_versions": quiet.get("query_versions", {}),
        "min_envelope_sec": envelope,
        "medians_sec": medians,
        "derivations_min_sec": deriv_min,
        "derivations_quiet_sec": deriv_quiet,
    }

    if prev:
        # derivation envelope deltas vs prev (older artifacts lack the
        # section — then every derivation just reports as new)
        prev_deriv = prev.get("derivations_min_sec", {})
        art["derivations_vs_prev"] = {
            k: {"prev_min": prev_deriv.get(k), "cur_min": v}
            for k, v in deriv_min.items()
            if prev_deriv.get(k) is None or
               (prev_deriv[k] > 0.05 and
                (v > 1.5 * prev_deriv[k] or v < prev_deriv[k] / 1.5))}
        prev_env = prev.get("min_envelope_sec", {})
        prev_ver = prev.get("query_versions", {})
        cur_ver = art["query_versions"]
        moved = {}
        for q, cur in envelope.items():
            if q not in prev_env:
                continue
            if prev_ver.get(q, 1) != cur_ver.get(q, 1):
                continue  # semantics changed: not comparable
            base = prev_env[q]
            if base > 0.05 and (cur > 1.5 * base or cur < base / 1.5):
                moved[q] = {"prev_min": base, "cur_min": cur}
        art["regressions_vs_prev"] = moved

    json.dump(art, open(out_path, "w"), indent=1, sort_keys=True)
    print(f"{out_path}: {len(names)} queries, {len(runs)} runs, "
          f"envelope {art['min_envelope_total_sec']}s, "
          f"quiet median {art['median_total_sec']}s")


if __name__ == "__main__":
    main()
