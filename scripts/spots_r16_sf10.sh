#!/bin/bash
# r16 scale evidence, phase A+B (sf10): size-tiered fold series with
# measured bytes, 20-epoch compacted-sibling probes, dedup ingest-one
# vs maintained index, and the cold/warm link+bm25 probe record.
# Sequential — one JVM at a time (fresh JVM per probe), idle machine.
set -x
cd /root/repo
L=/tmp/r16_spots; mkdir -p $L
SBT="sbt -batch"

# ---------- 1. size-tiered fold series (search index, 20-way slices)
S=/tmp/r16_s20; rm -rf $S
$SBT "runMain graft.tools.IndexMaint ingest search /tmp/sf10 $S 20 16" > $L/fold_i16.log 2>&1
du -sb $S/postings > $L/fold_bytes.txt
$SBT "runMain graft.tools.IndexMaint maintain search $S" > $L/fold_m0.log 2>&1
du -sb $S/postings-compact/gen=0 >> $L/fold_bytes.txt
ls -l --time-style=full-iso $S/postings-compact/gen=0/*/*.parquet > $L/gen0_before.txt 2>/dev/null || \
  find $S/postings-compact/gen=0 -name '*.parquet' -exec ls -l --time-style=full-iso {} + > $L/gen0_before.txt
$SBT "runMain graft.tools.IndexMaint ingest search /tmp/sf10 $S 20 18" > $L/fold_i18.log 2>&1
du -sb $S/postings >> $L/fold_bytes.txt
$SBT "runMain graft.tools.IndexMaint maintain search $S 3.0" > $L/fold_m1.log 2>&1
du -sb $S/postings-compact/gen=1 >> $L/fold_bytes.txt
$SBT "runMain graft.tools.IndexMaint ingest search /tmp/sf10 $S 20 20" > $L/fold_i20.log 2>&1
du -sb $S/postings >> $L/fold_bytes.txt
$SBT "runMain graft.tools.IndexMaint maintain search $S 3.0" > $L/fold_m2.log 2>&1
du -sb $S/postings-compact/gen=2 >> $L/fold_bytes.txt
find $S/postings-compact/gen=0 -name '*.parquet' -exec ls -l --time-style=full-iso {} + > $L/gen0_after.txt
diff -q $L/gen0_before.txt $L/gen0_after.txt > $L/gen0_untouched.txt 2>&1; echo "diff_rc=$?" >> $L/gen0_untouched.txt
$SBT "runMain graft.tools.IndexMaint files $S" > $L/fold_files_tiered.log 2>&1

# ---------- 2. 20-epoch sibling probes: plain vs compacted (search)
P=/tmp/r16_s20_plain; rm -rf $P
$SBT "runMain graft.tools.IndexMaint ingest search /tmp/sf10 $P 20" > $L/plain_i20.log 2>&1
$SBT "runMain graft.tools.IndexMaint files $P" > $L/plain_files.log 2>&1
# fold the tiered index fully (gen0+gen2 -> one generation)
$SBT "runMain graft.tools.IndexMaint maintain search $S" > $L/fold_m3.log 2>&1
$SBT "runMain graft.tools.IndexMaint files $S" > $L/fold_files_final.log 2>&1
$SBT "runMain graft.tools.IndexMaint probe bm25 $P /tmp/sf10" > $L/probe_bm25_plain20.log 2>&1
$SBT "runMain graft.tools.IndexMaint probe bm25 $S /tmp/sf10" > $L/probe_bm25_compact20.log 2>&1

# ---------- 3. dedup at 20 epochs: ingest-one vs maintained index
DA=/tmp/r16_d21_plain; DB=/tmp/r16_d21_maint; rm -rf $DA $DB
$SBT "runMain graft.tools.IndexMaint ingest dedup /tmp/sf10 $DA 21 20" > $L/dedup_a_i20.log 2>&1
$SBT "runMain graft.tools.IndexMaint ingest dedup /tmp/sf10 $DB 21 20" > $L/dedup_b_i20.log 2>&1
$SBT "runMain graft.tools.IndexMaint maintain dedup $DB" > $L/dedup_b_maint.log 2>&1
$SBT "runMain graft.tools.IndexMaint files $DA" > $L/dedup_a_files.log 2>&1
$SBT "runMain graft.tools.IndexMaint files $DB" > $L/dedup_b_files.log 2>&1
# epoch 20 lands against 20 epoch trees (A) vs one generation (B)
$SBT "runMain graft.tools.IndexMaint ingest dedup /tmp/sf10 $DA 21" > $L/dedup_a_one.log 2>&1
$SBT "runMain graft.tools.IndexMaint ingest dedup /tmp/sf10 $DB 21" > $L/dedup_b_one.log 2>&1

# ---------- 4. cold/warm probe record (link + bm25, sf10, 12 epochs)
LI=/tmp/r16_link10; rm -rf $LI
$SBT "runMain graft.tools.IndexMaint ingest link /tmp/sf10 $LI 12" > $L/link10_ingest.log 2>&1
for p in link_rank link_trustrank link_hits link_domain link_anchors; do
  $SBT "runMain graft.tools.IndexMaint probe $p $LI /tmp/sf10" > $L/cold10_$p.log 2>&1
done
# prior: first JVM materializes, second records the true cold read
$SBT "runMain graft.tools.IndexMaint probe link_rank_prior $LI /tmp/sf10" > $L/cold10_prior_build.log 2>&1
$SBT "runMain graft.tools.IndexMaint probe link_rank_prior $LI /tmp/sf10" > $L/cold10_link_rank_prior.log 2>&1
echo PHASE_AB_DONE
