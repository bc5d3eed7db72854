#!/usr/bin/env python3
"""Per-query bench regression diff between two driver BENCH_r*.json files
(or raw Bench contract-line JSON files).

Usage: python3 tools/benchdiff.py BENCH_rOLD.json BENCH_rNEW.json [--noise SEC]

Prints queries whose delta exceeds the noise floor (default 0.5 s — SURVEY
§8 puts run-to-run noise at ±5 s total across ~90 queries), plus added /
removed queries and the total. Driver files whose `parsed` is null are
recovered from the stdout `tail` when the contract line survives in it.
"""
import json
import re
import sys


def load(path):
    """Return (total_sec, {query: sec}) from a driver BENCH file or a raw
    contract line."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:  # raw contract line
        return d.get("value"), d["queries"]
    p = d.get("parsed")
    if p and "queries" in p:
        return p.get("value"), p["queries"]
    # parsed:null — recover what we can from the captured stdout tail
    tail = d.get("tail", "")
    m = re.search(r'"queries":\{', tail)
    frag = tail[m.end():] if m else tail
    qs = dict((k, float(v)) for k, v in
              re.findall(r'"([A-Za-z0-9_]+)":([0-9.]+)', frag))
    qs.pop("sf", None)
    total = None
    tm = re.search(r'"value":([0-9.]+)', tail)
    if tm:
        total = float(tm.group(1))
    print(f"note: {path} has parsed=null; recovered {len(qs)} queries "
          f"from the stdout tail (may be truncated)", file=sys.stderr)
    return total, qs


def main():
    argv, args, noise = sys.argv[1:], [], 0.5
    i = 0
    while i < len(argv):
        if argv[i].startswith("--noise"):
            if "=" in argv[i]:
                noise = float(argv[i].split("=", 1)[1])
            else:
                i += 1
                noise = float(argv[i])
        else:
            args.append(argv[i])
        i += 1
    if len(args) != 2:
        sys.exit(__doc__)
    old_total, old = load(args[0])
    new_total, new = load(args[1])

    # rollup-rung awareness: past ~100 queries the Bench ladder folds the
    # fastest queries into one "_other" bucket. A key absent from a side
    # that HAS "_other" was (almost surely) folded, not removed/added —
    # report it as folded instead of polluting the regression signal.
    old_rolled = "_other" in old
    new_rolled = "_other" in new
    old.pop("_other", None)
    new.pop("_other", None)
    folded_new = sorted(q for q in set(old) - set(new)) if new_rolled else []
    folded_old = sorted(q for q in set(new) - set(old)) if old_rolled else []
    added = sorted(set(new) - set(old) - set(folded_old))
    removed = sorted(set(old) - set(new) - set(folded_new))
    moved = sorted(((new[q] - old[q], q) for q in set(old) & set(new)
                    if abs(new[q] - old[q]) > noise), reverse=True)

    if moved:
        print(f"deltas > {noise:.2f}s (old -> new):")
        for d, q in moved:
            print(f"  {q:24s} {old[q]:7.2f} -> {new[q]:7.2f}  ({d:+.2f})")
    else:
        print(f"no per-query delta exceeds the {noise:.2f}s noise floor")
    if added:
        print("added:   " + ", ".join(f"{q} ({new[q]:.2f}s)" for q in added))
    if removed:
        print("removed: " + ", ".join(f"{q} ({old[q]:.2f}s)" for q in removed))
    if folded_new:
        print(f"folded into _other (new side): {len(folded_new)} queries "
              f"({sum(old[q] for q in folded_new):.1f}s on the old side)")
    if folded_old:
        print(f"folded into _other (old side): {len(folded_old)} queries "
              f"({sum(new[q] for q in folded_old):.1f}s on the new side)")
    if old_rolled or new_rolled:
        print("note: rollup-rung line(s) — common-query totals cover the "
              "kept subset only")

    def tot(t, qs):
        return t if t is not None else sum(qs.values())
    ot, nt = tot(old_total, old), tot(new_total, new)
    common_old = sum(old[q] for q in set(old) & set(new))
    common_new = sum(new[q] for q in set(old) & set(new))
    print(f"total: {ot:.1f}s ({len(old)} queries) -> {nt:.1f}s ({len(new)} queries); "
          f"common-query total {common_old:.1f}s -> {common_new:.1f}s "
          f"({common_new - common_old:+.1f}s)")


if __name__ == "__main__":
    main()
