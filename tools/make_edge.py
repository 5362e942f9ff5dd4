#!/usr/bin/env python3
"""Build an edge-case corpus dir: the sf0.001 fixtures plus documents with
null / empty / whitespace-only / unicode / single-token text. Running the
full Verify + compare against it catches null-path divergences that the
null-free driver fixtures cannot (this sweep found three in round 3:
txt_token_stats, txt_langid, txt_fingerprint).

Usage: make_edge.py [outDir]   (default /tmp/edge)
Then:  sbt "runMain graft.Verify <outDir> /tmp/verify_edge"
       python3 tools/compare.py <outDir> /tmp/verify_edge
"""
import sys, shutil, glob, os
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/edge"
src = "/root/testdata/sf0.001"
os.makedirs(out, exist_ok=True)
for p in glob.glob(f"{src}/*.parquet"):
    shutil.copy(p, out)
duckdb.connect().execute(f"""
COPY (
  SELECT * FROM '{src}/documents.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    (100001, NULL, 'en', 'src0', 0),
    (100002, '', 'en', 'src1', 0),
    (100003, '   ', 'fr', 'src2', 3),
    (100004, 'æøå 中文 naïve 🎉 test', 'zh', 'src3', 20),
    (100005, 'single', 'de', 'src4', 6),
    (100006, 'a  b   c', 'es', 'src5', 8)
  ) t(doc_id, text, lang, source, n_chars)
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
print(f"edge corpus at {out}")
