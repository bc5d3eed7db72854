#!/usr/bin/env python3
"""Cross-engine seam fuzzer: generate a seeded ADVERSARIAL corpus with the
exact TESTDATA schemas, run the full Spark roster (graft.Verify) against
it, and compare every oracle-gated query with DuckDB (the check.py
comparator) on the same files.

Why: the q86 1-ulp hash landmine, the q173 0/0 NaN seam, and the HUGEINT
overflow seam were each found singly, in production rounds. This harness
replays the whole exact-arithmetic roster over inputs built to sit ON the
seams both engines must agree across:

  - boundary decimals (x.005 / x.995 cents — round-half behavior),
  - NEGATIVE event values (trunc-vs-floor integral division),
  - zero values / zero variance / all-tied groups (0/0 and NULL-z guards),
  - duplicate timestamps (total-order tie-breaks),
  - perfect-square and square-minus-one char masses (isqrt floor law),
  - empty strings, single-char docs, exact-duplicate docs (tokenizers,
    dedup, md5 over UTF-8),
  - zero / tiny / all-equal embedding vectors (quantize-to-zero guards),
  - single-event classes and single-line orders (n=1 degenerate stats).

Referential integrity and value DOMAINS mirror the real generator
(TESTDATA.md) so query preconditions hold; only the distributions are
hostile. Deterministic per --seed.

Usage:
  python3 tools/fuzz_seams.py [--seed 1] [--outdir target/fuzz]
  # generates <outdir>/sf-fuzz/*.parquet, runs sbt graft.Verify on it,
  # then the DuckDB compare; exit 0 iff every gated query matches.
"""
import argparse
import random
import subprocess
import sys
from datetime import datetime, timedelta
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent


def boundary_money(rng):
    """Decimal values that sit on rounding seams when scaled to cents."""
    pick = rng.random()
    if pick < 0.25:
        return round(rng.randint(1, 99999) + 0.005, 3)   # half-cent edge
    if pick < 0.5:
        return round(rng.randint(1, 99999) + 0.995, 3)
    if pick < 0.6:
        return float(rng.randint(1, 99999))               # exact integers
    if pick < 0.65:
        return 0.01                                       # one cent
    return round(rng.uniform(0.01, 99999.99), 2)


def gen(outdir: Path, seed: int):
    rng = random.Random(seed)
    outdir.mkdir(parents=True, exist_ok=True)

    def write(name, cols, schema):
        pq.write_table(pa.table(cols, schema=schema), outdir / f"{name}.parquet")

    write("region", {
        "r_regionkey": list(range(5)),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }, pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))

    write("nation", {
        "n_nationkey": list(range(25)),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": [i % 5 for i in range(25)],
    }, pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                  ("n_regionkey", pa.int32())]))

    n_cust, n_supp, n_part, n_ord, n_li = 150, 10, 200, 1500, 6000
    segs = ["MACHINERY", "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD"]
    write("customer", {
        "c_custkey": list(range(1, n_cust + 1)),
        "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
        # heavy mass on nations < 5 (several queries filter there), plus
        # a few lone customers per remaining nation (n=1 group stats)
        "c_nationkey": [rng.randrange(5) if i % 7 else i % 25
                        for i in range(1, n_cust + 1)],
        # negative balances and exact zeros next to boundary decimals
        "c_acctbal": [(-1.0) ** i * boundary_money(rng) if i % 11 else 0.0
                      for i in range(1, n_cust + 1)],
        "c_mktsegment": [segs[i % 5] for i in range(1, n_cust + 1)],
    }, pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                  ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                  ("c_mktsegment", pa.string())]))

    write("supplier", {
        "s_suppkey": list(range(1, n_supp + 1)),
        "s_name": [f"Supplier#{i:09d}" for i in range(1, n_supp + 1)],
        "s_nationkey": [i % 25 for i in range(1, n_supp + 1)],
        "s_acctbal": [boundary_money(rng) for _ in range(n_supp)],
    }, pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                  ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]))

    brands = [f"Brand#{i}" for i in range(1, 26)]
    types = ["ECONOMY", "PROMO", "STANDARD", "SMALL", "LARGE"]
    write("part", {
        "p_partkey": list(range(1, n_part + 1)),
        "p_name": [f"part {i}" for i in range(1, n_part + 1)],
        "p_brand": [brands[i % 25] for i in range(n_part)],
        "p_type": [types[i % 5] for i in range(n_part)],
        "p_size": [(i % 50) + 1 for i in range(n_part)],
        # a run of IDENTICAL prices (all-tied group) then boundaries
        "p_retailprice": [900.0 if i < 40 else boundary_money(rng)
                          for i in range(n_part)],
    }, pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                  ("p_brand", pa.string()), ("p_type", pa.string()),
                  ("p_size", pa.int32()), ("p_retailprice", pa.float64())]))

    d0 = datetime(1995, 1, 1)
    statuses, prios = ["F", "O", "P"], [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    # duplicate order dates (monthly grid ties) + month-boundary dates
    odates = [d0 + timedelta(days=rng.randrange(0, 2400)) for _ in range(n_ord)]
    for i in range(0, n_ord, 13):
        odates[i] = d0  # a pile-up on one exact date
    write("orders", {
        "o_orderkey": list(range(1, n_ord + 1)),
        "o_custkey": [rng.randrange(1, n_cust + 1) for _ in range(n_ord)],
        "o_orderstatus": [statuses[i % 3] for i in range(n_ord)],
        "o_totalprice": [boundary_money(rng) for _ in range(n_ord)],
        "o_orderdate": odates,
        "o_orderpriority": [prios[i % 5] for i in range(n_ord)],
    }, pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                  ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
                  ("o_orderdate", pa.timestamp("us")),
                  ("o_orderpriority", pa.string())]))

    flags, lstat = ["A", "N", "R"], ["O", "F"]
    li = {k: [] for k in ["l_orderkey", "l_partkey", "l_suppkey",
                          "l_linenumber", "l_quantity", "l_extendedprice",
                          "l_discount", "l_tax", "l_returnflag",
                          "l_linestatus", "l_shipdate"]}
    for i in range(n_li):
        ok = (i % n_ord) + 1
        li["l_orderkey"].append(ok)
        li["l_partkey"].append(rng.randrange(1, n_part + 1))
        li["l_suppkey"].append(rng.randrange(1, n_supp + 1))
        li["l_linenumber"].append((i // n_ord) + 1)
        # all-tied quantities for flag A (rank/mode tie-breaks), plus
        # integer quantities elsewhere
        flag = flags[i % 3]
        li["l_quantity"].append(25.0 if flag == "A" and i % 2 == 0
                                else float(rng.randrange(1, 51)))
        li["l_extendedprice"].append(boundary_money(rng))
        li["l_discount"].append([0.0, 0.05, 0.1, 0.04, 0.06][i % 5])
        li["l_tax"].append([0.0, 0.08, 0.02][i % 3])
        li["l_returnflag"].append(flag)
        li["l_linestatus"].append(lstat[i % 2])
        li["l_shipdate"].append(odates[ok - 1] + timedelta(days=i % 90))
    write("lineitem", li, pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us"))]))

    # events: negative values, zeros, duplicate timestamps, a constant-value
    # class, a single-event class, user ids saturating the 60-slot bitmap
    n_ev = 1000
    e0 = datetime(2024, 1, 1)
    etypes = ["click", "view", "purchase", "signup", "error"]
    ev = {k: [] for k in ["event_id", "ts", "user_id", "event_type",
                          "value", "props"]}
    for i in range(n_ev):
        ev["event_id"].append(i + 1)
        # duplicated exact timestamps every 10th event (tie-break seams)
        t = e0 + timedelta(seconds=(i // 10) * 977 if i % 10 < 2
                           else i * 997 + rng.randrange(0, 500))
        ev["ts"].append(t)
        ev["user_id"].append(i % 60 if i % 3 else rng.randrange(0, 15))
        if i == 0:
            ev["event_type"].append("signup_once")  # single-event class
        else:
            ev["event_type"].append(etypes[i % 5])
        if etypes[i % 5] == "error" and i:
            v = 7.0  # constant-value class: zero variance, all-tied ranks
        elif i % 13 == 0:
            v = -boundary_money(rng) / 100.0  # NEGATIVE values
        elif i % 17 == 0:
            v = 0.0
        else:
            v = round(rng.uniform(0.01, 327.0) + (0.005 if i % 7 == 0 else 0), 3)
        ev["value"].append(v)
        ev["props"].append('{"k": %d}' % (i % 100) if i % 9 else '{"k": 0}')

    # --- out-of-order / late-arrival slicing (the st_* watermark fuzz) ---
    # The batch tables are order-insensitive, but the st_* twins replay
    # events.parquet as a file stream — and when the table is a DIRECTORY
    # of slice files, EventStream stages one slice per micro-batch in
    # name order. Slice so that later batches carry events OLDER than
    # events already processed (genuine late data), under the two
    # contracts every streaming system states and ours tests:
    #   1. BOUNDED lateness: a displaced event stays within LATE_BOUND
    #      (5 min) of its origin slice's max ts — safely inside every
    #      twin's 10-minute watermark, so no engine is ALLOWED to drop it
    #      and the batch oracle must still match;
    #   2. PER-USER arrival order: only a user's ts-SUFFIX within the
    #      tail window moves (whole suffix or nothing), so the stateful
    #      twins' documented ordered-arrival convention holds while
    #      CROSS-user order is violated freely.
    ev_schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string())])
    rows = sorted(
        (dict(zip(ev.keys(), vals)) for vals in zip(*ev.values())),
        key=lambda r: (r["ts"], r["event_id"]))
    n_slices, late_bound = 4, timedelta(minutes=5)
    cut = [rows[i * len(rows) // n_slices:(i + 1) * len(rows) // n_slices]
           for i in range(n_slices)]
    for i in range(n_slices - 1):
        max_ts = max(r["ts"] for r in cut[i])
        tail_users = {r["user_id"] for r in cut[i]
                      if r["ts"] >= max_ts - late_bound}
        # move ~half the tail users' suffixes one slice later; keep the
        # max-ts event's user so the origin slice's watermark still
        # advances to max_ts (the displaced events are then genuinely
        # late relative to it, not merely re-cut)
        max_user = next(r["user_id"] for r in cut[i] if r["ts"] == max_ts)
        movers = {u for u in tail_users
                  if u != max_user and rng.random() < 0.5}
        moved = [r for r in cut[i]
                 if r["user_id"] in movers and r["ts"] >= max_ts - late_bound]
        cut[i] = [r for r in cut[i] if r not in moved]
        cut[i + 1] = moved + cut[i + 1]
    ev_dir = outdir / "events.parquet"
    if ev_dir.exists() and not ev_dir.is_dir():
        ev_dir.unlink()  # stale single-file layout from an older run
    ev_dir.mkdir(parents=True, exist_ok=True)
    for old in ev_dir.glob("*.parquet"):
        old.unlink()
    for i, rows_i in enumerate(cut):
        cols = {k: [r[k] for r in rows_i] for k in ev.keys()}
        pq.write_table(pa.table(cols, schema=ev_schema),
                       ev_dir / f"slice-{i:03d}.parquet")

    # documents: empty text, single char, exact + near duplicates, and
    # per-source char masses engineered onto isqrt boundaries
    words = ("the fast key order sort table scan merge part window small "
             "hash join stream customer data group filter row value batch "
             "slow query spark line").split()
    langs = ["en", "de", "fr", "es", "zh"]
    docs = {k: [] for k in ["doc_id", "text", "lang", "source", "n_chars"]}

    def add_doc(i, text, lang, source):
        docs["doc_id"].append(i)
        docs["text"].append(text)
        docs["lang"].append(lang)
        docs["source"].append(source)
        docs["n_chars"].append(len(text))

    base = " ".join(rng.choices(words, k=40))
    add_doc(0, "", "en", "src0")                      # empty text
    add_doc(1, "a", "en", "src0")                     # single char
    add_doc(2, base, "en", "src1")                    # original
    add_doc(3, base, "en", "src1")                    # exact duplicate
    add_doc(4, base + " extra", "en", "src1")         # near duplicate
    # source char masses: 99² and 99²−1 (the guarded-isqrt seam)
    add_doc(5, "x" * (99 * 99), "en", "srq_sq")
    add_doc(6, "y" * (99 * 99 - 1), "en", "srq_sqm1")
    for i in range(7, 500):
        n = rng.randrange(3, 120)
        add_doc(i, " ".join(rng.choices(words, k=n)), langs[i % 5],
                f"src{i % 20}")
    write("documents", docs, pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
        ("source", pa.string()), ("n_chars", pa.int64())]))

    # embeddings: zero vector, duplicate vectors, tiny magnitudes that
    # quantize to all-zero codes, half-up boundary components
    dim, n_emb = 64, 500
    vecs, labels = [], []
    for i in range(n_emb):
        if i == 0:
            v = [0.0] * dim                               # zero vector
        elif i in (1, 2):
            v = [1.0] * dim                               # exact duplicates
        elif i == 3:
            v = [1e-30 * ((j % 3) - 1) for j in range(dim)]  # quantize→0
        elif i == 4:
            v = [(j % 2 * 2 - 1) * 0.5 for j in range(dim)]  # ±0.5 ties
        else:
            v = [rng.uniform(-1, 1) for _ in range(dim)]
        vecs.append([float(f"%.6g" % x) for x in v])
        labels.append(i % 4)
    write("embeddings", {
        "vec_id": list(range(n_emb)),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        "label": labels,
    }, pa.schema([("vec_id", pa.int64()),
                  ("embedding", pa.list_(pa.float32())),
                  ("label", pa.int32())]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--outdir", default=str(REPO / "target" / "fuzz"))
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--prefixes", default=None,
                    help="optional comma-separated query-name prefixes")
    args = ap.parse_args()
    data = Path(args.outdir) / f"sf-fuzz-{args.seed}"
    out = Path(args.outdir) / f"verify-{args.seed}"
    if not args.skip_gen:
        gen(data, args.seed)
        print(f"[fuzz] corpus written to {data}")
    cmd = ["sbt", "-batch", "runMain graft.Verify %s %s%s" % (
        data, out, f" {args.prefixes}" if args.prefixes else "")]
    print("[fuzz] running Spark roster:", " ".join(cmd))
    r = subprocess.run(cmd, cwd=REPO)
    if r.returncode != 0:
        print("[fuzz] Verify failed", file=sys.stderr)
        return 1
    check = [sys.executable, str(REPO / "tools" / "check.py"),
             str(data), str(out)]
    if args.prefixes:
        check.append(args.prefixes)
    r = subprocess.run(check, cwd=REPO)
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
