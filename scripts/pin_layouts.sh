#!/bin/sh
# Regenerate ANY pinned-oracle query's rows, with the layout-independence
# check the pinned pattern requires: dump at 4 AND 32 cores, refuse to
# print unless both layouts are bit-identical, then print the sorted rows
# to paste into the oracle's VALUES list.
#
#   scripts/pin_layouts.sh embed_pq_topk
#   scripts/pin_layouts.sh text_search_bm25 bpe_encode ...
#
# Pinned queries in the repo: embed_ivf_topk, embed_ivf_recall,
# embed_pq_topk, embed_pq_recall, embed_ivfadc_topk, text_search_bm25,
# bpe_train_merges, bpe_encode, approx_distinct, hll_daily_users.
set -e
cd "$(dirname "$0")/.."
[ $# -ge 1 ] || { echo "usage: $0 <query> [query...]" >&2; exit 2; }
NAMES=$(printf '%s,' "$@"); NAMES=${NAMES%,}
OUT4=$(mktemp -d); OUT32=$(mktemp -d)
SPARK_GRAFT_VERIFY_ONLY="$NAMES" SPARK_GRAFT_CPUS=4 \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT4" >/dev/null
SPARK_GRAFT_VERIFY_ONLY="$NAMES" SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT32" >/dev/null
python3 - "$OUT4" "$OUT32" "$@" <<'EOF'
import sys, duckdb
out4, out32, names = sys.argv[1], sys.argv[2], sys.argv[3:]
fail = False
for name in names:
    a = duckdb.sql(f"select * from '{out4}/{name}/*.parquet' order by all").fetchall()
    b = duckdb.sql(f"select * from '{out32}/{name}/*.parquet' order by all").fetchall()
    if a != b:
        print(f"-- {name}: LAYOUT-DEPENDENT ({len(a)} vs {len(b)} rows) — DO NOT PIN")
        fail = True
        continue
    cols = [d[0] for d in duckdb.sql(
        f"select * from '{out4}/{name}/*.parquet' limit 0").description]
    print(f"-- {name}: {len(a)} rows, bit-identical at 4 and 32 cores ({', '.join(cols)})")
    def sqllit(v):
        return "'" + v.replace("'", "''") + "'" if isinstance(v, str) else str(v)
    for r in a:
        print("(" + ", ".join(sqllit(v) for v in r) + "),")
sys.exit(1 if fail else 0)
EOF
