#!/usr/bin/env python3
"""Round-12 crafted cross-engine sweeps (driver-side: needs duckdb).

Builds adversarial corpora the fixtures never produce and drives the
REAL Verify + oracle pipeline over them, so engine-vs-DuckDB agreement
is checked on the hazard class, not just the happy path:

  unicode : multibyte/emoji/RTL/Turkish-dotted-I/combining-accent text
            through the tokenizer/regex/text-stats family (Java regex is
            code-point aware, so it agrees with RE2 even on astral
            chars — verified 10/10 in round 12)
  scd     : duplicate SCD2 version dates (zero-width shadowing), events
            at exact version boundaries, open-row matches, CDC latest-op
            ties at identical timestamps resolved by event_id
            (verified 4/4 in round 12; outputs hand-derived in
            PLANS.md round-12 sweep tally)
  coarse  : the WHOLE 295-query oracle surface over a time-coarsened
            copy of sf0.001 (events ts -> hour, all order/lineitem
            dates -> month), so every window gains peer groups and
            every (ts, date) order key gains duplicates — the global
            tie/determinism sweep (verified 295/295 in round 12: the
            §2.Z tie-break discipline holds surface-wide)

Usage: python3 tools/crafted_sweeps.py [unicode|scd|coarse|all]
Exit 0 = every query matches its oracle on every crafted corpus.
"""
import subprocess
import sys

import duckdb


def build_unicode(d):
    con = duckdb.connect()
    docs = [
        (1, "hello world the data key", "en", "web"),
        (2, "héllo wörld café naïve", "fr", "web"),
        (3, "日本語のテキスト データ処理", "ja", "wiki"),
        (4, "emoji test 😀😀 🎉 end", "en", "social"),
        (5, "Türkçe İstanbul DİYARBAKIR ığdır", "tr", "web"),
        (6, "עברית טקסט rtl mixed ltr", "he", "wiki"),
        (7, "zero​width and combining é accent", "en", "web"),
        (8, "ПРИВЕТ мир кириллица", "ru", "social"),
        (9, "", "en", "web"),
        (10, "   multiple   spaces   ", "en", "web"),
    ]
    rows = [(i, t, l, s, len(t)) for (i, t, l, s) in docs]
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR, lang VARCHAR,"
                " source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows)
    con.execute(f"COPY d TO '{d}/documents.parquet' (FORMAT PARQUET)")
    return ["llm_text_stats", "llm_tokenize", "llm_char_ngrams", "llm_ttr",
            "llm_zipf_fit", "llm_lang_id", "llm_quality", "llm_pii_mask",
            "llm_entropy", "llm_repetition"]


def build_scd(d):
    con = duckdb.connect()
    con.execute("""CREATE TABLE orders AS SELECT * FROM (VALUES
      (101, 1, TIMESTAMP '2026-01-01 00:00:00', 10.0),
      (102, 1, TIMESTAMP '2026-01-01 00:00:00', 20.0),
      (103, 1, TIMESTAMP '2026-02-01 00:00:00', 30.0),
      (201, 2, TIMESTAMP '2026-03-01 00:00:00', 40.0)
    ) t(o_orderkey, o_custkey, o_orderdate, o_totalprice)""")
    con.execute(f"COPY orders TO '{d}/orders.parquet' (FORMAT PARQUET)")
    con.execute("""CREATE TABLE events AS SELECT * FROM (VALUES
      (1, TIMESTAMP '2026-01-01 00:00:00', 1, 'view', 1.0),
      (2, TIMESTAMP '2026-01-01 01:00:00', 1, 'click', 2.0),
      (3, TIMESTAMP '2026-02-01 00:00:00', 1, 'view', 3.0),
      (4, TIMESTAMP '2026-01-31 23:59:59', 1, 'view', 4.0),
      (5, TIMESTAMP '2025-12-01 00:00:00', 1, 'view', 5.0),
      (6, TIMESTAMP '2026-06-01 00:00:00', 1, 'purchase', 6.0),
      (7, TIMESTAMP '2026-02-15 00:00:00', 2, 'error', 7.0),
      (8, TIMESTAMP '2026-02-15 00:00:00', 2, 'view', 8.0)
    ) t(event_id, ts, user_id, event_type, value)""")
    con.execute(f"COPY events TO '{d}/events.parquet' (FORMAT PARQUET)")
    return ["join_scd2", "cdc_apply", "join_asof", "join_asof_native"]


def build_coarse(d):
    con = duckdb.connect()
    src = "/root/testdata/sf0.001"
    for t in ["region", "nation", "customer", "supplier", "part",
              "documents", "embeddings"]:
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
                    f"'{d}/{t}.parquet' (FORMAT PARQUET)")
    con.execute(
        f"COPY (SELECT * REPLACE (date_trunc('month', o_orderdate) AS o_orderdate)"
        f" FROM '{src}/orders.parquet') TO '{d}/orders.parquet' (FORMAT PARQUET)")
    cols = [r[0] for r in con.execute(
        f"describe select * from '{src}/lineitem.parquet'").fetchall()]
    rep = ", ".join(f"date_trunc('month', {c}) AS {c}"
                    for c in cols if "date" in c)
    con.execute(f"COPY (SELECT * REPLACE ({rep}) FROM '{src}/lineitem.parquet')"
                f" TO '{d}/lineitem.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY (SELECT * REPLACE (date_trunc('hour', ts) AS ts)"
                f" FROM '{src}/events.parquet') TO '{d}/events.parquet' (FORMAT PARQUET)")
    return []  # empty = run the FULL declared oracle surface


def run(name, build):
    import tempfile
    src = tempfile.mkdtemp(prefix=f"graft_sweep_{name}_")
    out = tempfile.mkdtemp(prefix=f"graft_sweep_{name}_out_")
    queries = build(src)
    subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {src} {out} " + " ".join(queries)],
        check=True, cwd="/root/repo")
    r = subprocess.run(
        ["python3", "tools/oracle_check.py", src, out] + queries,
        cwd="/root/repo")
    if r.returncode != 0:
        print(f"SWEEP {name}: MISMATCH")
        return False
    scope = f"{len(queries)}/{len(queries)}" if queries else "full surface"
    print(f"SWEEP {name}: {scope} match")
    return True


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    builders = {"unicode": build_unicode, "scd": build_scd,
                "coarse": build_coarse}
    todo = builders if which == "all" else {which: builders[which]}
    ok = all([run(n, b) for n, b in todo.items()])
    sys.exit(0 if ok else 1)
