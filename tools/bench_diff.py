#!/usr/bin/env python3
"""Bench regression tracker: compare two FULL bench records (the
`bench_out.json` written by graft.Bench — per-query times, not the
top-5 stdout line) and flag per-query regressions.

Usage: bench_diff.py OLD.json NEW.json [ratio_threshold] [abs_floor_sec]

A query is flagged when new/old > ratio_threshold (default 1.5) AND
new-old > abs_floor_sec (default 0.3 s — sub-noise-floor queries can
double without meaning anything). Also reports queries present in only
one record (suite drift: silently lost queries look exactly like a
faster total) and failed queries recorded by either run.

Exit code 1 when anything is flagged, so a round script can gate on it.
"""
import json, sys

old_p = sys.argv[1]
new_p = sys.argv[2]
ratio_thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
abs_floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3

old = json.load(open(old_p))
new = json.load(open(new_p))
oq, nq = old["queries"], new["queries"]

problems = 0

lost = sorted(set(oq) - set(nq))
gained = sorted(set(nq) - set(oq))
if lost:
    problems += len(lost)
    print(f"LOST from suite ({len(lost)}): {', '.join(lost)}")
if gained:
    print(f"new in suite ({len(gained)}): {', '.join(gained)}")
for rec, tag in ((old, "old"), (new, "new")):
    failed = rec.get("failed", [])
    if failed:
        problems += len(failed)
        print(f"FAILED in {tag} run ({len(failed)}): {', '.join(failed)}")
    if not rec.get("official", True):
        print(f"note: {tag} run is marked non-official "
              f"(flagged={rec.get('load_flagged')}, failed={failed})")

shared = sorted(set(oq) & set(nq))
flagged = [(k, oq[k], nq[k]) for k in shared
           if nq[k] > oq[k] * ratio_thr and nq[k] - oq[k] > abs_floor]
improved = [(k, oq[k], nq[k]) for k in shared
            if oq[k] > nq[k] * ratio_thr and oq[k] - nq[k] > abs_floor]
def guard_readings(rec, q):
    """Per-query guard readings (r12+ artifacts): gc fraction plus the
    measurement window's external-CPU and iowait cores — what lets a
    disagreeing pair be attributed to host ripple from the artifacts
    alone."""
    parts = []
    for field, label in (("gc_frac", "gc"), ("ext_cpu", "ext"), ("iowait", "io")):
        v = rec.get(field, {}).get(q)
        if v is not None:
            parts.append(f"{label}={v:.2f}")
    return " ".join(parts)

if flagged:
    problems += len(flagged)
    print(f"\nREGRESSED (> {ratio_thr}x and > {abs_floor}s):")
    for k, o, n in sorted(flagged, key=lambda t: t[1] - t[2]):
        ctx = " | ".join(x for x in (guard_readings(old, k), guard_readings(new, k)) if x)
        print(f"  {k}: {o:.2f}s -> {n:.2f}s ({n / o:.1f}x)"
              + (f"  [{ctx}]" if ctx else ""))
if improved:
    print(f"\nimproved (> {ratio_thr}x):")
    for k, o, n in sorted(improved, key=lambda t: t[2] - t[1]):
        ctx = " | ".join(x for x in (guard_readings(old, k), guard_readings(new, k)) if x)
        print(f"  {k}: {o:.2f}s -> {n:.2f}s ({n / o:.1f}x)"
              + (f"  [{ctx}]" if ctx else ""))

ot = sum(oq[k] for k in shared)
nt = sum(nq[k] for k in shared)
print(f"\nshared-suite total: {ot:.1f}s -> {nt:.1f}s ({nt / ot:.2f}x) "
      f"over {len(shared)} queries; full totals {old['value']:.1f}s "
      f"({len(oq)}q) -> {new['value']:.1f}s ({len(nq)}q)")
sys.exit(1 if problems else 0)
