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
con = duckdb.connect()
con.execute(f"""
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
# events edges: null value, null/empty/MALFORMED json props, and a
# replayed duplicate event_id (round 3: malformed props errored the
# ev_json_props oracle; null value shifted ev_outliers ranks; the
# duplicate collapsed in ev_asof_native's GROUP-BY oracle)
con.execute(f"""
COPY (
  SELECT * FROM '{src}/events.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    (9000001, TIMESTAMP '2024-01-15 12:00:00', 42, 'click', NULL, '{{"k": 7}}'),
    (9000002, TIMESTAMP '2024-01-15 12:00:01', 42, 'view', 1.25, NULL),
    (9000003, TIMESTAMP '2024-01-15 12:00:02', 42, 'purchase', 2.5, '{{bad json'),
    (9000004, TIMESTAMP '2024-01-15 12:00:03', 43, 'click', 3.0, ''),
    (9000004, TIMESTAMP '2024-01-15 12:00:03', 43, 'click', 3.0, '')
  ) t(event_id, ts, user_id, event_type, value, props)
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")
print(f"edge corpus at {out}")
