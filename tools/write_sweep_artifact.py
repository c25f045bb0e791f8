"""Aggregate a scale-sweep JSONL into the committed SWEEP_r{N}.json.

Mirrors tools/scale_sweep.py's parent aggregation (min per
(query, point) within one run id, exponent fit between the two largest
points) but runs standalone, so a sweep whose parent was cut short —
e.g. the p100 second pass sacrificed to the round's time budget —
still yields a complete artifact from the records that exist. Also
carries error rows (a query that FAILED at a point is a finding, not a
hole) and the per-point scheduler probes.

Usage: python tools/write_sweep_artifact.py IN.jsonl OUT.json [run_id]
           [--overlay RUN_ID:q1,q2,...]
(run_id defaults to the newest one present in the file)

--overlay replaces the named queries' timing/pass/error rows with the
rows a LATER run recorded — the round-7 use case: a query's plan was
redesigned mid-round after the main sweep measured (or failed) it, and
the committed artifact must describe the COMMITTED code. The main
run's rows for overlaid queries are kept verbatim under
"superseded_by_overlay" so the pre-redesign failures stay on the
record instead of silently vanishing.
"""

from __future__ import annotations

import json
import math
import sys

POINT_K = {"p1": 1, "p10": 10, "p100": 100}


def main() -> int:
    args = [a for a in sys.argv[1:]]
    overlay_run, overlay_qs = None, set()
    if "--overlay" in args:
        i = args.index("--overlay")
        overlay_run, qs = args[i + 1].split(":", 1)
        overlay_qs = set(qs.split(","))
        del args[i:i + 2]
    src, dst = args[0], args[1]
    want = args[2] if len(args) > 2 else None
    all_rows = [json.loads(l) for l in open(src)]
    if want is None:
        # exclude the overlay run when defaulting: the overlay is
        # appended AFTER the main sweep, so ids[-1] would otherwise
        # resolve to the overlay itself and drop every main-run row
        ids = [
            r["run_id"]
            for r in all_rows
            if r.get("run_id") and r["run_id"] != overlay_run
        ]
        if not ids:
            print("no non-overlay run ids found in", src, file=sys.stderr)
            return 1
        want = ids[-1]
    rows = [
        r
        for r in all_rows
        if r.get("run_id") == want and r.get("query") not in overlay_qs
    ]
    superseded = [
        r
        for r in all_rows
        if r.get("run_id") == want and r.get("query") in overlay_qs
    ]
    overlay_rows = [
        r
        for r in all_rows
        if overlay_run
        and r.get("run_id") == overlay_run
        and r.get("query") in overlay_qs
    ]
    rows += overlay_rows
    if overlay_run:
        # an overlaid query with no overlay rows — or missing a scale
        # point the superseded run had — would silently read as "not
        # measured"; fail loudly instead (ADVICE r7)
        cover = {}
        for r in overlay_rows:
            cover.setdefault(r["query"], set()).add(r.get("point"))
        old_cover = {}
        for r in superseded:
            old_cover.setdefault(r["query"], set()).add(r.get("point"))
        problems = []
        for q in sorted(overlay_qs):
            if q not in cover:
                problems.append(f"{q}: no rows under overlay run {overlay_run}")
            elif q in old_cover and not old_cover[q] <= cover[q]:
                missing = sorted(p for p in old_cover[q] - cover[q] if p)
                problems.append(f"{q}: overlay missing points {missing}")
        if problems:
            for p in problems:
                print("overlay coverage:", p, file=sys.stderr)
            return 1

    mins: dict[str, dict[str, float]] = {}
    passes: dict[str, dict[str, list]] = {}
    recalls: dict[str, dict[str, float]] = {}
    probes: dict[str, float] = {}
    errors: dict[str, dict[str, str]] = {}
    for r in rows:
        if "probe_ms_per_job" in r:
            probes[r["point"]] = r["probe_ms_per_job"]
        elif "recall" in r:
            recalls.setdefault(r["query"], {})[r["point"]] = r["recall"]
        elif r.get("sec", -1) < 0:
            errors.setdefault(r["query"], {})[r["point"]] = r.get(
                "error", "?"
            )[:200]
        else:
            q, p = r["query"], r["point"]
            passes.setdefault(q, {}).setdefault(p, []).append(r["sec"])
            cur = mins.setdefault(q, {}).get(p)
            if cur is None or r["sec"] < cur:
                mins[q][p] = r["sec"]

    exps = {}
    for q, pts in mins.items():
        have = sorted((POINT_K[p], t) for p, t in pts.items())
        if len(have) >= 2:
            (ka, ta), (kb, tb) = have[-2], have[-1]
            if ta > 0 and tb > 0:
                exps[q] = round(math.log(tb / ta) / math.log(kb / ka), 2)

    out = {
        "run_id": want,
        "points": {p: {"K": k} for p, k in POINT_K.items()},
        "pass_counts": {
            q: {p: len(v) for p, v in d.items()} for q, d in passes.items()
        },
        "queries": mins,
        "exponents": exps,
        "ann_recall": recalls,
        "probe_ms_per_job": probes,
        "comparable": bool(probes)
        and all(p < 100.0 for p in probes.values()),
        "errors": errors,
    }
    if overlay_run:
        out["overlay"] = {
            "run_id": overlay_run,
            "queries": sorted(overlay_qs),
        }
        out["superseded_by_overlay"] = [
            {k: v for k, v in r.items() if k != "run_id"} for r in superseded
        ]
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {dst}: {len(mins)} queries, {len(errors)} error rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
