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

All other tables are copied through unchanged. Usage:
  tools/make_mutated.py <mode> [srcdir] [outdir]
"""
import argparse
import os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# deterministic by doc_id — no randomness, so re-runs are identical
UNICODE_TEXT = """
CASE WHEN doc_id % 5 = 0 THEN 'héllo ' ELSE '' END || text ||
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


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=sorted(MUTATIONS))
    ap.add_argument("srcdir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("outdir", nargs="?", default=None)
    ns = ap.parse_args()
    outdir = ns.outdir or f"/tmp/{ns.mode.replace('-', '')}_corpus"
    os.makedirs(outdir, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{ns.srcdir}/{t}.parquet"
        if os.path.isdir(src):  # spark-written table directory
            src += "/*.parquet"
        sel = MUTATIONS[ns.mode].get(t, "SELECT * FROM t")
        con.sql(f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{src}'")
        con.sql(f"COPY ({sel}) TO '{outdir}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{outdir}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows -> {outdir}/{t}.parquet")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
