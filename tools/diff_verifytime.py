#!/usr/bin/env python3
"""Diff two <outDir>_VERIFYTIME.json records (r14 verdict: give the
second per-query timing artifact a consumer, diff_planaudit's pattern).

VERIFYTIME is SUPPORTING evidence with sharp edges its own r14 record
demonstrates: the dump action is coalesce(1)+parquet (absolutes differ
from BENCH), st1 carries the CONCURRENT st-family launch wall-clock
(st2-st8 are cache fetches), and single readings on this host class
jitter up to 20x (BASELINE.md — r14's q06 read 12.8 s against a 0.37 s
bench floor, one-off). So this tool reads RATIOS the way the standing
methodology reads bench totals:

  * the MEDIAN ratio across shared queries is the host-state signature —
    a uniform up/down-list is VM class, not plans (BASELINE.md r06/r11);
  * a MOVER is a query whose ratio deviates from that median by more
    than MOVER_X in either direction AND whose larger reading clears
    ABS_FLOOR seconds — sub-floor rows are priced entirely by scheduling
    jitter and job-launch overhead, and their ratios are noise;
  * st1 is annotated, never counted: its reading is the family launch.

Movers are NAMED for review, not auto-judged: a real plan regression
reproduces in the bench/TimeQuery re-measure; one-off host wobble does
not (the r12 lesson).

Usage: python3 tools/diff_verifytime.py VERIFYTIME_r14.json VERIFYTIME_r15.json
Exit status: 0 when the shared-query sets match and no movers; 1 otherwise.
"""
import json
import statistics
import sys

ABS_FLOOR = 2.0   # s — below this, a dump is launch overhead + jitter
MOVER_X = 3.0     # deviation from the median ratio that names a mover
FAM_ROWS = {"st1_stream_dedup_ingest"}  # family-launch wall-clock rows


def code(name):
    return name.split("_", 1)[0]


def main(old_path, new_path):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    rc = 0
    added, removed = set(new) - set(old), set(old) - set(new)
    if added:
        print(f"queries only in new: {sorted(code(q) for q in added)}")
    if removed:
        # a silently dropped query is a regression; additions are growth
        print(f"queries only in old: {sorted(code(q) for q in removed)}")
        rc = 1
    shared = sorted(set(old) & set(new))
    ratios = {q: new[q] / old[q] for q in shared if old[q] > 0}
    if not ratios:
        print("no shared queries with positive old readings")
        return 1
    med = statistics.median(ratios.values())
    print(f"median ratio (host-state signature): {med:.2f}x "
          f"across {len(ratios)} shared queries")
    movers = []
    for q in shared:
        if q not in ratios:
            continue
        r, o, n = ratios[q], old[q], new[q]
        tag = ""
        if q in FAM_ROWS:
            tag = "  [fam: concurrent st-family launch — not counted]"
        elif max(o, n) < ABS_FLOOR:
            continue  # sub-floor: jitter-priced, ratio is noise
        elif r > med * MOVER_X or r < med / MOVER_X:
            movers.append(q)
            tag = "  <-- MOVER (re-measure before believing: one-off " \
                  "jitter does not reproduce, a regression does)"
        if tag:
            print(f"  {code(q):5s} {o:7.2f} -> {n:7.2f} s  ({r:5.2f}x){tag}")
    print(f"movers vs median (|dev| > {MOVER_X}x, > {ABS_FLOOR:.0f}s): "
          f"{len(movers)}")
    return 1 if (rc or movers) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
