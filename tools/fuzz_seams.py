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


def slice_boundary(cut, rng):
    """Displace events AT and BEYOND the one watermark-drop boundary this
    roster has, and return the event_ids a watermark-respecting engine
    must DROP (the filtered batch oracle for the dropping twin).

    Where the boundary lives: every windowed st_* aggregation runs in
    Complete mode (state never evicted — late rows are aggregated, the
    full batch oracle must match them), and the custom-state twins keep
    their own per-user folds with no watermark filter. The ONE operator
    whose semantics can lose beyond-lateness data is st_join: an
    Append-mode stream-stream interval join with 1-hour watermarks on
    both sides.

    MEASURED semantics (Spark 4.1.2, probes P1–P7 below — the first
    boundary run falsified the documented the-watermark-drops-inputs
    model): late INPUT rows are NOT filtered, at any lateness — a
    purchase 1 s, 31 min, or 26 h beyond the global watermark still
    joins, and two deep-late rows arriving in the SAME batch still meet
    (P2, P4, P5, P6 all emitted their pairs). The only mechanism that
    loses a pair is STATE EVICTION, which runs at batch boundaries: a
    click is evicted once the watermark passes a_ts + 30min (the join
    window), so the one losable shape is a pair whose halves arrive
    separated by at least one watermark advance past the partner's
    eviction point (P7). On a drained finite replay, everything else
    matches the batch join bit-for-bit — a far stronger disorder
    tolerance than the watermark model implies, at the price of state
    that outlives the watermark by exactly the join window.

    Displacement + probes:

      class B (far beyond): a few users' ENTIRE ts-suffix from an early
        cut point arrives in the final batch — per-user arrival order
        holds (the whole suffix moves, in order), but the old rows are
        hours-to-days beyond the watermark. Measured: counted by every
        twin (they form no click→purchase pairs, and late inputs are
        not filtered), so they stay in the FULL oracle view — pure
        disorder stress.

      P1: purchase at exactly wm, click partner timely — pair survives;
      P2: purchase at wm - 1s — KEPT (no input filter at the global
        watermark);
      P3: click at wm - 15min + in-batch partner at wm + 5min — pair
        survives;
      P4: purchase at wm - 31min, click partner at wm - 41min from the
        PREVIOUS batch — partner still in state (eviction needs the
        watermark to pass a_ts + 30min, first true in this final batch,
        and eviction runs after the join) — pair survives;
      P5: click at wm - 31min + in-batch partner at wm - 1min — KEPT
        (no a-side input filter either);
      P6: click/purchase pair 26 h late arriving together — KEPT
        (deep-late rows still meet in-batch);
      P7 (the one real loss): click timely in the FIRST batch, its
        purchase partner arriving in the final batch, days later — the
        click's state was evicted several watermark advances earlier,
        so the pair is gone; its purchase id is the drop-file entry the
        filtered st_join oracle excludes.
    """
    H = timedelta(hours=1)

    def side_max(t):
        return max(r["ts"] for s in cut[:3] for r in s if r["event_type"] == t)

    wm = min(side_max("click"), side_max("purchase")) - H
    guard_lo, guard_hi = wm - timedelta(minutes=45), wm
    # the side-max rows must stay in batches 0..2 or wm itself would move
    pinned_users = {
        next(r["user_id"] for s in cut[:3] for r in s
             if r["event_type"] == t and r["ts"] == side_max(t))
        for t in ("click", "purchase")}

    dropped = []
    slice0_users = [r["user_id"] for r in cut[0]]
    cand = sorted({u for u in slice0_users if slice0_users.count(u) >= 3
                   and u not in pinned_users})
    moved_users = []
    for u in cand:
        if len(moved_users) >= 4:
            break
        suffix_cut = sorted(r["ts"] for r in cut[0] if r["user_id"] == u)[2]
        urows = [r for s in cut for r in s
                 if r["user_id"] == u and r["ts"] >= suffix_cut]
        if any(r["event_type"] in ("click", "purchase")
               and guard_lo <= r["ts"] < guard_hi for r in urows):
            continue
        if any(r["ts"] in (side_max("click"), side_max("purchase"))
               for r in urows):
            continue
        moved_users.append(u)
        for i in range(len(cut)):
            cut[i] = [r for r in cut[i] if r not in urows]
        cut[-1] = cut[-1] + sorted(urows, key=lambda r: r["ts"])
    assert moved_users, "boundary corpus found no class-B candidate users"

    def probe(eid, ts, user, etype):
        return {"event_id": eid, "ts": ts, "user_id": user,
                "event_type": etype, "value": 5.0, "props": '{"k": 1}'}

    # P1: purchase exactly AT wm (final batch) + timely click partner
    cut[2].append(probe(9001, wm - timedelta(minutes=10), 9101, "click"))
    cut[-1].append(probe(9002, wm, 9101, "purchase"))
    # P2: purchase 1 s beyond the global watermark — measured KEPT (state
    # watermark = wm - 30min governs, not wm); its pair must survive
    cut[2].append(probe(9003, wm - timedelta(minutes=10, seconds=30), 9102,
                        "click"))
    cut[-1].append(probe(9004, wm - timedelta(seconds=1), 9102, "purchase"))
    # P3: click inside the a-side allowance + in-batch purchase partner
    cut[-1].append(probe(9005, wm - timedelta(minutes=15), 9103, "click"))
    cut[-1].append(probe(9006, wm + timedelta(minutes=5), 9103, "purchase"))
    # P4: purchase past the watermark whose previous-batch partner is
    # still in state (eviction lags the join) — measured KEPT
    cut[2].append(probe(9007, wm - timedelta(minutes=41), 9104, "click"))
    cut[-1].append(probe(9008, wm - timedelta(minutes=31), 9104, "purchase"))
    # P5: click below wm - 30min + in-batch kept partner — measured KEPT
    cut[-1].append(probe(9009, wm - timedelta(minutes=31), 9105, "click"))
    cut[-1].append(probe(9010, wm - timedelta(minutes=1), 9105, "purchase"))
    # P6: deep-late pair arriving together — measured KEPT (meets in-batch)
    cut[-1].append(probe(9011, wm - timedelta(hours=26), 9106, "click"))
    cut[-1].append(probe(9012, wm - timedelta(hours=26, minutes=-10), 9106,
                         "purchase"))
    # P7: the one losable shape — click timely in the FIRST batch, its
    # eviction point crossed batches ago; the purchase arrives last
    first_max = max(r["ts"] for r in cut[0])
    p7_click_ts = first_max - timedelta(hours=1)
    cut[0].append(probe(9013, p7_click_ts, 9107, "click"))
    cut[-1].append(probe(9014, p7_click_ts + timedelta(minutes=10), 9107,
                         "purchase"))
    dropped = [9014]
    print(f"[fuzz] boundary: wm={wm} moved_users={moved_users} "
          f"dropped={len(dropped)} rows")
    return dropped


def gen(outdir: Path, seed: int, late_mode="bounded"):
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
    n_slices = 4
    # bounded mode (default, the r14 corpus): displaced rows stay within
    # 5 min of their origin slice's max — inside every twin's watermark,
    # so no engine may drop them. boundary mode (r15, verdict item 7):
    # the tail window widens to 55 min — PAST the agg twins' notional
    # 10-minute watermark (Complete-mode aggregation keeps all state, so
    # those twins must still count the rows: the full batch oracle) yet
    # safely inside st_join's 1-hour horizon — and slice_boundary() below
    # additionally displaces rows AT and BEYOND the only drop boundary
    # this roster has.
    late_bound = timedelta(minutes=5 if late_mode == "bounded" else 55)
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
    dropped_ids = []
    if late_mode == "boundary":
        dropped_ids = slice_boundary(cut, rng)
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
    drop_file = outdir / "dropped_event_ids.txt"
    if late_mode == "boundary":
        drop_file.write_text("".join(f"{i}\n" for i in sorted(dropped_ids)))
    elif drop_file.exists():
        drop_file.unlink()  # stale boundary-mode artifact

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
    ap.add_argument("--late-mode", choices=["bounded", "boundary"],
                    default="bounded",
                    help="bounded: all displaced rows stay inside every "
                         "watermark (no engine may drop them). boundary: "
                         "rows land AT and BEYOND the drop boundary; the "
                         "dropping twin (st_join) is gated against a "
                         "batch oracle minus the engine-dropped rows")
    args = ap.parse_args()
    tag = f"{args.seed}" if args.late_mode == "bounded" \
        else f"{args.seed}-boundary"
    data = Path(args.outdir) / f"sf-fuzz-{tag}"
    out = Path(args.outdir) / f"verify-{tag}"
    if not args.skip_gen:
        gen(data, args.seed, args.late_mode)
        print(f"[fuzz] corpus written to {data}")
    cmd = ["sbt", "-batch", "runMain graft.Verify %s %s%s" % (
        data, out, f" {args.prefixes}" if args.prefixes else "")]
    print("[fuzz] running Spark roster:", " ".join(cmd))
    r = subprocess.run(cmd, cwd=REPO)
    if r.returncode != 0:
        print("[fuzz] Verify failed", file=sys.stderr)
        return 1
    check_py = str(REPO / "tools" / "check.py")
    if args.late_mode == "boundary":
        # two-pass gate: every non-dropping entry against the FULL batch
        # oracle (Complete-mode aggs must count late rows; custom-state
        # twins hold their per-user folds), the dropping twin against the
        # oracle filtered exactly by the replicated drop rule
        r1 = subprocess.run([sys.executable, check_py, str(data), str(out),
                             "--skip", "st_join"]
                            + ([args.prefixes] if args.prefixes else []),
                            cwd=REPO)
        r2 = subprocess.run([sys.executable, check_py, str(data), str(out),
                             "--only", "st_join", "--exclude-events",
                             str(data / "dropped_event_ids.txt")], cwd=REPO)
        return r1.returncode or r2.returncode
    check = [sys.executable, check_py, str(data), str(out)]
    if args.prefixes:
        check.append(args.prefixes)
    r = subprocess.run(check, cwd=REPO)
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
