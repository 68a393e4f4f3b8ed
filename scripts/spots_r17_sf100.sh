#!/bin/bash
# r17 scale evidence, phase B (sf100, 1000x): the link rank-table
# refresh cost per table (the policy-default amortization input at the
# rung where it matters) and the trust/hits materialized-table cold
# record — fresh JVM per probe, idle machine.
set -x
cd /root/repo
L=/tmp/r17_spots; mkdir -p $L
SBT="sbt -batch"

LI=/tmp/r17_link100; rm -rf $LI
$SBT "runMain graft.tools.IndexMaint ingest link /tmp/sf100 $LI 12" > $L/link100_ingest.log 2>&1
# per-table materialization on the 12-epoch view (fresh rank-mat)
$SBT "runMain graft.tools.IndexMaint refresh $LI" > $L/link100_refresh.log 2>&1
# trust/hits table reads: first JVM after the refresh is the true cold
$SBT "runMain graft.tools.IndexMaint probe link_trustrank_prior $LI /tmp/sf100" > $L/cold100_link_trustrank_prior.log 2>&1
$SBT "runMain graft.tools.IndexMaint probe link_hits_prior $LI /tmp/sf100" > $L/cold100_link_hits_prior.log 2>&1
# computed twins for the ratio
$SBT "runMain graft.tools.IndexMaint probe link_trustrank $LI /tmp/sf100" > $L/cold100_link_trustrank.log 2>&1
$SBT "runMain graft.tools.IndexMaint probe link_hits $LI /tmp/sf100" > $L/cold100_link_hits.log 2>&1
echo PHASE_B_DONE
