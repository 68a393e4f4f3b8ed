#!/bin/sh
# Regenerate the pinned embed_ivf_topk oracle rows (EmbeddingOps.
# ivfTopKPinnedSql): dump the query at sf0.01, print the rows to paste.
# The query is deterministic by construction (id-hash-ordered k-means
# sample, exact decimal-summed centroids), so the pin is stable until the
# fixture or the IVF parameters change.
set -e
cd "$(dirname "$0")/.."
OUT=$(mktemp -d)
SPARK_GRAFT_VERIFY_ONLY=embed_ivf_topk \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT" >/dev/null
python3 - "$OUT" <<'EOF'
import sys, duckdb
rows = duckdb.sql(
    f"select query_id, rank, corpus_id from '{sys.argv[1]}/embed_ivf_topk/*.parquet' "
    "order by query_id, rank").fetchall()
print(f"-- {len(rows)} rows")
for r in rows:
    print(f"({r[0]}, {r[1]}, {r[2]}),")
EOF
