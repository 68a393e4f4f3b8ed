#!/bin/bash
# r17 scale evidence, phase A (sf10): ANN-index maintenance record
# (r16 verdict #7 — fold series in bytes, 20-epoch compacted-sibling
# probes, ingest-one vs maintained), the link family's deep-history
# refresh/maintain costs (verdict #6 — the policy-default input), and
# the trust/hits materialized-table cold-probe record (verdict #2).
# Sequential — one JVM at a time (fresh JVM per probe), idle machine.
set -x
cd /root/repo
L=/tmp/r17_spots; mkdir -p $L
SBT="sbt -batch"

# ---------- 1. ANN size-tiered fold series (20-way slices), bytes
AS=/tmp/r17_ann20; rm -rf $AS
$SBT "runMain graft.tools.IndexMaint ingest ann /tmp/sf10 $AS 20 16" > $L/ann_i16.log 2>&1
du -sb $AS/vecs $AS/buckets > $L/ann_bytes.txt
$SBT "runMain graft.tools.IndexMaint maintain ann $AS" > $L/ann_m0.log 2>&1
du -sb $AS/vecs-compact/gen=0 $AS/buckets-compact/gen=0 >> $L/ann_bytes.txt
find $AS/vecs-compact/gen=0 -name '*.parquet' -exec ls -l --time-style=full-iso {} + > $L/ann_gen0_before.txt
$SBT "runMain graft.tools.IndexMaint ingest ann /tmp/sf10 $AS 20 18" > $L/ann_i18.log 2>&1
du -sb $AS/vecs $AS/buckets >> $L/ann_bytes.txt
$SBT "runMain graft.tools.IndexMaint maintain ann $AS 3.0" > $L/ann_m1.log 2>&1
du -sb $AS/vecs-compact/gen=1 $AS/buckets-compact/gen=1 >> $L/ann_bytes.txt
$SBT "runMain graft.tools.IndexMaint ingest ann /tmp/sf10 $AS 20 20" > $L/ann_i20.log 2>&1
$SBT "runMain graft.tools.IndexMaint maintain ann $AS 3.0" > $L/ann_m2.log 2>&1
du -sb $AS/vecs-compact/gen=2 $AS/buckets-compact/gen=2 >> $L/ann_bytes.txt
find $AS/vecs-compact/gen=0 -name '*.parquet' -exec ls -l --time-style=full-iso {} + > $L/ann_gen0_after.txt
diff -q $L/ann_gen0_before.txt $L/ann_gen0_after.txt > $L/ann_gen0_untouched.txt 2>&1; echo "diff_rc=$?" >> $L/ann_gen0_untouched.txt
$SBT "runMain graft.tools.IndexMaint files $AS" > $L/ann_files_tiered.log 2>&1

# ---------- 2. ANN 20-epoch sibling probes: plain vs compacted
AP=/tmp/r17_ann20_plain; rm -rf $AP
$SBT "runMain graft.tools.IndexMaint ingest ann /tmp/sf10 $AP 20" > $L/ann_plain_i20.log 2>&1
$SBT "runMain graft.tools.IndexMaint files $AP" > $L/ann_plain_files.log 2>&1
$SBT "runMain graft.tools.IndexMaint maintain ann $AS" > $L/ann_m3.log 2>&1
$SBT "runMain graft.tools.IndexMaint files $AS" > $L/ann_files_final.log 2>&1
$SBT "runMain graft.tools.IndexMaint probe ann $AP /tmp/sf10" > $L/ann_probe_plain20.log 2>&1
$SBT "runMain graft.tools.IndexMaint probe ann $AS /tmp/sf10" > $L/ann_probe_compact20.log 2>&1

# ---------- 3. ANN ingest-one at epoch 20: plain trees vs maintained
# (ann ingest reads nothing back — unlike dedup — so this bounds the
# pure write+listing cost; the interesting delta is the policy check)
$SBT "runMain graft.tools.IndexMaint ingest ann /tmp/sf10 $AP 21" > $L/ann_plain_one.log 2>&1
$SBT "runMain graft.tools.IndexMaint ingest ann /tmp/sf10 $AS 21" > $L/ann_maint_one.log 2>&1

# ---------- 4. link deep history (20 epochs): refresh + maintain costs
LI=/tmp/r17_link20; rm -rf $LI
$SBT "runMain graft.tools.IndexMaint ingest link /tmp/sf10 $LI 20 19" > $L/link20_i19.log 2>&1
# per-table materialization cost on the 19-epoch view (fresh rank-mat)
$SBT "runMain graft.tools.IndexMaint refresh $LI" > $L/link20_refresh.log 2>&1
# full maintenance pass (compact + refresh for the same view [cached
# tables: ~0] + gc) — the policy-hook cost at a maintenance epoch
$SBT "runMain graft.tools.IndexMaint maintain link $LI" > $L/link20_maintain.log 2>&1
# one more epoch against the maintained index, then refresh for the NEW
# view — the per-epoch-commit cost if the policy refreshed every epoch
$SBT "runMain graft.tools.IndexMaint ingest link /tmp/sf10 $LI 20" > $L/link20_one.log 2>&1
$SBT "runMain graft.tools.IndexMaint refresh $LI" > $L/link20_refresh2.log 2>&1

# ---------- 5. trust/hits materialized-table cold record (sf10)
# first JVM builds (already built by the refresh above), second is the
# true cold read
$SBT "runMain graft.tools.IndexMaint probe link_trustrank_prior $LI /tmp/sf10" > $L/cold10_trust_prior_a.log 2>&1
$SBT "runMain graft.tools.IndexMaint probe link_trustrank_prior $LI /tmp/sf10" > $L/cold10_link_trustrank_prior.log 2>&1
$SBT "runMain graft.tools.IndexMaint probe link_hits_prior $LI /tmp/sf10" > $L/cold10_hits_prior_a.log 2>&1
$SBT "runMain graft.tools.IndexMaint probe link_hits_prior $LI /tmp/sf10" > $L/cold10_link_hits_prior.log 2>&1
# computed twins on the same 20-epoch index, for the ratio
$SBT "runMain graft.tools.IndexMaint probe link_trustrank $LI /tmp/sf10" > $L/cold10_link_trustrank.log 2>&1
$SBT "runMain graft.tools.IndexMaint probe link_hits $LI /tmp/sf10" > $L/cold10_link_hits.log 2>&1
echo PHASE_A_DONE
