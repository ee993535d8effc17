#!/usr/bin/env python3
"""Diff two PLANAUDIT_rN.json artifacts.

The artifact's hard invariants (unpartitioned windows, cartesians,
nondeterministic expressions) are checked by PlanAudit itself at record
time; this tool reads the SOFT fields across rounds — exchange counts,
join-strategy mix, broadcast exchanges, scan column sets, pushed
filters — and prints every per-query change, so a plan regression
reviews like a correctness regression: a named diff, not a re-derive.

Usage: python3 tools/diff_planaudit.py PLANAUDIT_r10.json PLANAUDIT_r11.json
Exit status: 0 if no diffs (and both violation lists empty), 1 otherwise.
"""
import json
import sys


def scanset(entry):
    return {
        (s["table"], tuple(s["columns"]), s.get("pushed_filters", ""))
        for s in entry.get("scans", [])
    }


def main(old_path, new_path):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    qo, qn = old["queries"], new["queries"]
    rc = 0
    for label, v in (("old", old), ("new", new)):
        if v.get("violations"):
            print(f"{label} artifact has hard violations: {v['violations']}")
            rc = 1
    added, removed = set(qn) - set(qo), set(qo) - set(qn)
    if added:
        print(f"queries only in new: {sorted(added)}")
    if removed:
        print(f"queries only in old: {sorted(removed)}")
        rc = 1  # a silently dropped query is a regression; additions are growth
    ndiffs = 0
    for name in sorted(set(qo) & set(qn)):
        o, n = qo[name], qn[name]
        if o.get("err") or n.get("err"):
            if o.get("err") != n.get("err"):
                print(f"{name}: err {o.get('err')!r} -> {n.get('err')!r}")
                ndiffs += 1
            continue
        for field in ("exchanges", "unpartitioned_windows", "cartesian_products",
                      "joins", "broadcast_exchanges", "nondeterministic_exprs"):
            # a field introduced in a later round (absent from the older
            # artifact) is not a plan change — only compare shared fields
            if field not in o or field not in n:
                continue
            if o.get(field) != n.get(field):
                print(f"{name}: {field} {o.get(field)} -> {n.get(field)}")
                ndiffs += 1
        so, sn = scanset(o), scanset(n)
        if so != sn:
            for s in sorted(so - sn):
                print(f"{name}: scan gone      {s}")
            for s in sorted(sn - so):
                print(f"{name}: scan appeared  {s}")
            ndiffs += 1
    print(f"soft diffs: {ndiffs} across {len(set(qo) & set(qn))} shared queries")
    return 1 if (rc or ndiffs) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
