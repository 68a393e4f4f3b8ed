#!/bin/bash
# r16 scale evidence, phase C (sf100): cold/warm probe record at the
# 1000x rung (12-epoch link index + 12-epoch search index), fresh JVM
# per probe, idle machine.
set -x
cd /root/repo
L=/tmp/r16_spots; mkdir -p $L
SBT="sbt -batch"

LI=/tmp/r16_link100; rm -rf $LI
$SBT "runMain graft.tools.IndexMaint ingest link /tmp/sf100 $LI 12" > $L/link100_ingest.log 2>&1
S=/tmp/r16_search100; rm -rf $S
$SBT "runMain graft.tools.IndexMaint ingest search /tmp/sf100 $S 12" > $L/search100_ingest.log 2>&1
for p in link_rank link_trustrank link_hits link_domain link_anchors; do
  $SBT "runMain graft.tools.IndexMaint probe $p $LI /tmp/sf100" > $L/cold100_$p.log 2>&1
done
$SBT "runMain graft.tools.IndexMaint probe bm25 $S /tmp/sf100" > $L/cold100_bm25.log 2>&1
$SBT "runMain graft.tools.IndexMaint probe link_rank_prior $LI /tmp/sf100" > $L/cold100_prior_build.log 2>&1
$SBT "runMain graft.tools.IndexMaint probe link_rank_prior $LI /tmp/sf100" > $L/cold100_link_rank_prior.log 2>&1
# bm25 cold at sf10 (the sf10 pair lives in phase A's 20-epoch logs)
echo PHASE_C_DONE
