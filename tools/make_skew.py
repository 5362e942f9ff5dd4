#!/usr/bin/env python3
"""Build a skew-stress corpus: the sf0.01 fixtures plus a HOT user (one
user re-emitting 20k events) and HOT content (300 near-identical docs in
7 content groups — just under the LSH MaxBucket cap per group). Running
Verify + compare of the skew-guarded gates against it proves the caps /
salting keep results EXACT under hot keys, not just bounded:

  q23_salted_agg q35_salted_join dd_minhash_lsh dd_simhash
  dd_containment dd_exact dd_dup_clusters dd_clean_corpus
  ev_session_windows ev_rolling_24h ev_outliers ev_funnel
  txt_vocab txt_tfidf ds_pack_text

Round-3 result: 15/15 match (dd_minhash_lsh resolves the 300-doc dup
cluster into 6304 verified pairs, all value-exact vs DuckDB).

Usage: make_skew.py [outDir]   (default /tmp/skew)
"""
import sys, shutil, glob, os
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew"
src = "/root/testdata/sf0.01"
os.makedirs(out, exist_ok=True)
for p in glob.glob(f"{src}/*.parquet"):
    shutil.copy(p, out)
con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT * FROM '{src}/events.parquet'
  UNION ALL
  SELECT 500000 + i AS event_id,
         TIMESTAMP '2024-01-10 00:00:00' + INTERVAL (i % 86400) SECOND AS ts,
         7 AS user_id, 'click' AS event_type,
         0.25 AS value, '{{"k": 1}}' AS props
  FROM generate_series(0, 19999) t(i)
) TO '{out}/events.parquet' (FORMAT PARQUET)""")
con.execute(f"""
COPY (
  SELECT * FROM '{src}/documents.parquet'
  UNION ALL
  SELECT 200000 + i,
         'the same hot boilerplate text repeated across the corpus shard number ' || (i % 7),
         'en', 'srchot', 70
  FROM generate_series(0, 299) t(i)
) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
print(f"skew corpus at {out}")
