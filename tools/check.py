#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>.parquet dirs + oracle_sql.json), then this script runs
each oracle SQL in DuckDB against the same sf dir and compares.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [prefixes]
           [--skip n1,n2] [--only n1,n2] [--exclude-events <ids.txt>]

The optional comma-separated [prefixes] mirrors graft.Verify's third arg:
only queries matching a prefix are gated (the rest were deliberately not
dumped by the filtered Verify run and are skipped, not failed).

--skip / --only take EXACT query names. --exclude-events points at a text
file of event_ids (one per line) removed from the oracle's `events` view —
the watermark-boundary fuzz uses it to gate a twin whose engine-side
semantics DROP those rows (beyond allowed lateness) against a batch oracle
filtered the same way.
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    """Sort columns by name, then rows by all columns — order-insensitive
    exact compare (mirrors the driver's sort-columns-then-hash)."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir, out_dir, prefixes=None, skip=None, only=None,
         exclude_events=None):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # sliced layout (the late-data stream fuzz)
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    if exclude_events:
        ids = [l.strip() for l in Path(exclude_events).read_text().splitlines()
               if l.strip()]
        con.sql("DROP VIEW IF EXISTS events")
        src = Path(sf_dir) / "events.parquet"
        glob = f"{src}/*.parquet" if src.is_dir() else str(src)
        id_list = ",".join(ids) if ids else "-1"
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{glob}' "
                f"WHERE event_id NOT IN ({id_list})")
        print(f"[check] events view excludes {len(ids)} dropped rows")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    pfx = prefixes.split(",") if prefixes else None
    for name in sorted(oracle):
        if pfx and not any(name.startswith(x) for x in pfx):
            continue
        if skip and name in skip:
            continue
        if only and name not in only:
            continue
        sql = oracle[name]
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result written")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        got_n, want_n = norm(got), norm(want)
        if list(got_n.columns) != list(want_n.columns):
            print(f"FAIL {name}: columns {list(got_n.columns)} != {list(want_n.columns)}")
            n_fail += 1
            continue
        if len(got_n) != len(want_n):
            print(f"FAIL {name}: rows {len(got_n)} != {len(want_n)}")
            n_fail += 1
            continue
        if len(got_n) == 0:
            print(f"WARN {name}: 0 rows on both sides (weak)")
        try:
            same = got_n.astype(str).equals(want_n.astype(str))
        except Exception as e:
            print(f"FAIL {name}: compare error {e}")
            n_fail += 1
            continue
        if same:
            print(f"PASS {name} ({len(got_n)} rows)")
            n_pass += 1
        else:
            diff = (got_n.astype(str) != want_n.astype(str))
            bad_cols = [c for c in got_n.columns if diff[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                idx = diff[c].idxmax()
                print(f"  first diff col={c} row={idx}: "
                      f"spark={got_n[c][idx]!r} duckdb={want_n[c][idx]!r}")
            n_fail += 1
    # queries without oracle get the driver's weaker rows>0 check
    for d in sorted(Path(out_dir).iterdir()):
        if only is not None:
            break  # a name-targeted pass gates exactly its names
        if d.is_dir() and d.name not in oracle:
            try:
                n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
                print(f"{'ROWS' if n > 0 else 'EMPTY'} {d.name} (no oracle, {n} rows)")
            except Exception as e:
                print(f"EMPTY {d.name} (no oracle, unreadable: {e})")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    kw = {}
    for flag, key, split in (("--skip", "skip", True), ("--only", "only", True),
                             ("--exclude-events", "exclude_events", False)):
        if flag in argv:
            i = argv.index(flag)
            val = argv[i + 1]
            kw[key] = set(val.split(",")) if split else val
            del argv[i:i + 2]
    sys.exit(main(argv[0], argv[1], argv[2] if len(argv) > 2 else None, **kw))
