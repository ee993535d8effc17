#!/usr/bin/env python3
"""Build a mutated copy of a fixture corpus for differential-semantics
tiers (r08 ROUND8 section 7d mechanism, made reproducible in r09): the
oracles run on the SAME corpus as the engine, so `graft.Verify` +
`tools/check.py` over a mutated copy turns the hash-compare into a free
Spark-vs-DuckDB semantics proof on inputs the driver fixtures never
reach.

Modes:
  unicode     multi-byte text injected into documents.text (2/3/4-byte
              UTF-8: accents, CJK, Hangul, Cyrillic, Greek, emoji,
              decomposed combining marks); n_chars recomputed as
              code-point length (both engines agree on len/length)
  null-text   NULL documents.text on a deterministic doc_id slice
  null-events NULL events.value / events.event_type on deterministic
              event_id slices
  skew        adversarial hot keys: 40%% of documents become exact
              copies of the first doc's text (one dup cluster larger
              than Dedup.BucketCap=150 at sf0.01 -> the LSH bucket-cap
              drop + full-signature star recovery run through the
              recorded oracle gate, not just ScalaTest), and one hot
              user absorbs a third of all events (fat sessions, a dense
              stream-stream join key, skewed windows)
  nonfinite   NaN / +-Infinity into events.value (the sensor-glitch
              class): pure-double paths agree cross-engine (NaN sorts
              largest on both), and every CAST(value AS DECIMAL) site
              carries the explicit nonfinite->NULL contract (engine
              try_cast, oracle TRY_CAST with an isnan guard -- DuckDB
              1.0's TRY_CAST still errors on NaN->DECIMAL)
  extreme     boundary values a 100 TB ingest WILL see that the driver
              fixtures never reach: documents get empty / whitespace-only
              / punctuation-only / single-token / 40x-repeated text
              slices (n_chars recomputed); events.value gets +-9.9e9
              magnitudes (the DECIMAL(14,4) envelope ev19 pins), -0.0,
              1e-13, and one whole event_type made 99%% constant (MAD=0,
              zero-variance stats); one l_returnflag group gets constant
              l_quantity (corr/stddev denominator hits exact 0);
              orders.o_orderdate gets a pre-Gregorian (1490) slice and
              l_shipdate a year-9999 slice (parquet datetime-rebase
              interop with a non-Spark writer); a user_id slice lands
              near Long.MaxValue; embeddings get a zero-norm vector
              slice (undefined cosine direction)

All other tables are copied through unchanged. Usage:
  tools/make_mutated.py <mode> [srcdir] [outdir]
"""
import argparse
import os
import tempfile

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# deterministic by doc_id — no randomness, so re-runs are identical.
# The %9 clause substitutes ONE character (the first 'e') with a 2-byte
# code point: a single multi-byte SUBSTITUTION inside any 40-char prefix,
# which keeps dd9's byte-vs-codepoint relabeling oracle non-vacuously
# exercised (near-dup doc pairs whose %9 residues differ sit at
# code-point distance d but byte distance d+1 — the exact divergence
# class the chained-hostile tier first caught); the append/prepend
# clauses alone sit beyond dd9's 40-char prefix window on normal docs,
# or past its maxDist when they do land inside it.
UNICODE_TEXT = """
CASE WHEN doc_id % 5 = 0 THEN 'héllo ' ELSE '' END ||
CASE WHEN doc_id % 9 = 2 THEN regexp_replace(text, 'e', 'é') ELSE text END ||
CASE WHEN doc_id % 3 = 0 THEN ' café 東京都 naïve' ELSE '' END ||
CASE WHEN doc_id % 3 = 1 THEN ' 🚀 ωμέγα Москва 한국어' ELSE '' END ||
CASE WHEN doc_id % 7 = 0 THEN ' éclair 🔥日本語' ELSE '' END
""".strip().replace("\n", " ")

MUTATIONS = {
    "unicode": {
        "documents":
            f"SELECT doc_id, {UNICODE_TEXT} AS text, lang, source, "
            f"CAST(len({UNICODE_TEXT}) AS BIGINT) AS n_chars FROM t",
    },
    "null-text": {
        "documents":
            "SELECT doc_id, CASE WHEN doc_id % 11 = 3 THEN NULL ELSE text END AS text, "
            "lang, source, "
            "CASE WHEN doc_id % 11 = 3 THEN NULL ELSE n_chars END AS n_chars FROM t",
    },
    "null-events": {
        "events":
            "SELECT event_id, ts, user_id, "
            "CASE WHEN event_id % 13 = 5 THEN NULL ELSE event_type END AS event_type, "
            "CASE WHEN event_id % 11 = 7 THEN NULL ELSE value END AS value, "
            "props FROM t",
    },
    "skew": {
        "documents":
            "WITH h AS (SELECT text AS htext FROM t WHERE doc_id = (SELECT min(doc_id) FROM t)) "
            "SELECT doc_id, CASE WHEN doc_id % 10 < 4 THEN h.htext ELSE text END AS text, "
            "lang, source, "
            "CAST(len(CASE WHEN doc_id % 10 < 4 THEN h.htext ELSE text END) AS BIGINT) AS n_chars "
            "FROM t, h",
        "events":
            "WITH h AS (SELECT min(user_id) AS hu FROM t) "
            "SELECT event_id, ts, "
            "CASE WHEN user_id % 3 = 0 THEN h.hu ELSE user_id END AS user_id, "
            "event_type, value, props FROM t, h",
    },
}

# extreme tier: every slice deterministic by primary key, all moduli
# distinct so document slices are (mostly) disjoint; first match wins.
EXTREME_TEXT = (
    "CASE WHEN doc_id % 53 = 9 THEN '' "
    "WHEN doc_id % 59 = 11 THEN '   ' "
    "WHEN doc_id % 61 = 13 THEN '.,;:!?#@' "
    "WHEN doc_id % 67 = 17 THEN 'zq' "
    "WHEN doc_id % 71 = 19 THEN rtrim(repeat(text || ' ', 40)) "
    "ELSE text END")

EXTREME_VALUE = (
    # one whole event_type 99% constant: MAD = 0 for ev18, a zero-variance
    # group for any stddev path; the 1% residue keeps the screen non-empty
    "CASE WHEN event_type = (SELECT min(event_type) FROM t) THEN "
    "  (CASE WHEN event_id % 100 = 7 THEN value ELSE 123.4567 END) "
    # magnitude extremes at the edge of ev19's DECIMAL(14,4) envelope
    "WHEN event_id % 17 = 2 THEN 9900000000.1234 "
    "WHEN event_id % 19 = 3 THEN -9900000000.4321 "
    # IEEE edge cases: negative zero (via VARCHAR cast — DuckDB folds a
    # bare -0.0 literal to +0.0) and a subnormal-adjacent magnitude
    "WHEN event_id % 23 = 5 THEN CAST('-0.0' AS DOUBLE) "
    "WHEN event_id % 29 = 7 THEN 1e-13 "
    "ELSE value END")

# non-finite measurements: the sensor-glitch class a 100 TB ingest WILL
# contain. NaN and +-Infinity flow through pure-double paths identically
# on both engines (NaN sorts/compares largest on both), but any
# CAST(value AS DECIMAL) site aborts under ANSI -- the same crash class
# the extreme tier exposed for division.
MUTATIONS["nonfinite"] = {
    "events":
        "SELECT event_id, ts, user_id, event_type, "
        "CASE WHEN event_id % 31 = 11 THEN 'NaN'::DOUBLE "
        "WHEN event_id % 41 = 13 THEN 'Infinity'::DOUBLE "
        "WHEN event_id % 43 = 17 THEN '-Infinity'::DOUBLE "
        "ELSE value END AS value, props FROM t",
}

MUTATIONS["extreme"] = {
    "documents":
        f"SELECT doc_id, {EXTREME_TEXT} AS text, lang, source, "
        f"CAST(len({EXTREME_TEXT}) AS BIGINT) AS n_chars FROM t",
    "events":
        f"SELECT event_id, ts, "
        # a user_id slice near Long.MaxValue: keys must hash/partition/join,
        # never participate in arithmetic
        "CASE WHEN user_id % 97 = 13 THEN user_id + 9223372036854000000 "
        "ELSE user_id END AS user_id, "
        f"event_type, {EXTREME_VALUE} AS value, props FROM t",
    "orders":
        # pre-Gregorian-reform timestamps: DuckDB writes proleptic INT64
        # micros with no Spark metadata -> exercises Spark's parquet
        # datetime-rebase interop path on read
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
        "CASE WHEN o_orderkey % 89 = 7 THEN TIMESTAMP '1490-03-15 12:00:00' "
        "ELSE o_orderdate END AS o_orderdate, o_orderpriority FROM t",
    "lineitem":
        # one whole l_returnflag group constant quantity: q41's corr
        # denominator hits exact zero (NaN cross-engine contract); plus a
        # far-future shipdate slice
        "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, "
        "CASE WHEN l_returnflag = 'R' THEN 25.0 ELSE l_quantity END AS l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        "CASE WHEN l_orderkey % 83 = 11 THEN TIMESTAMP '9999-12-01 00:00:00' "
        "ELSE l_shipdate END AS l_shipdate FROM t",
    "embeddings":
        # zero-norm vectors: no defined cosine direction — the contract the
        # similarity family must make explicit
        "SELECT vec_id, CASE WHEN vec_id % 37 = 3 THEN "
        "CAST(list_transform(embedding, x -> 0.0) AS FLOAT[]) "
        "ELSE embedding END AS embedding, label FROM t",
}


# The chained-hostile interaction tier (ROUND9.md section 18c): all six
# mutations composed into one corpus, in an EXPLICIT order so the tier is
# reproducible from the repo (the original r09 build chained the modes by
# hand). unicode runs FIRST (multi-byte content in the base texts, and
# the %9 single-substitution slice creates multi-byte NEAR-pairs among
# the corpus's near-dup groups — the composition class that reached
# dd9's byte-vs-codepoint oracle blind spot); skew then copies the
# DECORATED hot doc, so the over-cap exact-copy cluster's shared text
# contains multi-byte code points while staying an exact cluster (the
# cap-kill + star machinery still engages); null-text runs LAST so NULL
# text lands over extreme-mutated docs rather than being resurrected by
# extreme's literal slices.
HOSTILE_ORDER = ["unicode", "skew", "null-events", "nonfinite", "extreme", "null-text"]


def apply_mode(con, mode: str, srcdir: str, outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    for t in TABLES:
        src = f"{srcdir}/{t}.parquet"
        if os.path.isdir(src):  # spark-written table directory
            src += "/*.parquet"
        sel = MUTATIONS[mode].get(t, "SELECT * FROM t")
        con.sql(f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{src}'")
        con.sql(f"COPY ({sel}) TO '{outdir}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{outdir}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows -> {outdir}/{t}.parquet")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=sorted(MUTATIONS) + ["hostile"])
    ap.add_argument("srcdir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("outdir", nargs="?", default=None)
    ns = ap.parse_args()
    outdir = ns.outdir or f"/tmp/{ns.mode.replace('-', '')}_corpus"
    con = duckdb.connect()
    if ns.mode == "hostile":
        # intermediate stages live under a TemporaryDirectory so a run
        # leaves ONLY the final corpus behind (previously the five
        # <outdir>.stageN copies persisted — a 6x disk surprise, and a
        # stale stageN dir could be mistaken for the tier corpus)
        with tempfile.TemporaryDirectory(prefix="hostile_stages_") as stage_root:
            src = ns.srcdir
            for i, m in enumerate(HOSTILE_ORDER):
                dst = outdir if i == len(HOSTILE_ORDER) - 1 else f"{stage_root}/stage{i}"
                print(f"-- hostile stage {i}: {m}")
                apply_mode(con, m, src, dst)
                src = dst
        return 0
    apply_mode(con, ns.mode, ns.srcdir, outdir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
