#!/bin/bash
# Fourth-decade (x1000) scale table, leg-by-leg — the disk-bounded-host
# protocol (round-13): each leg group runs in its own JVM with
# SPARK_GRAFT_PROBE_SKIP naming everything else, 64g driver, pair legs
# min-of-3 internally (SPARK_GRAFT_PROBE_RUNS=3 default), planted-copy
# obligations always on. e3_fixed_8x8 is skipped at this scale by
# protocol: it is the REFERENCE row for the old fixed default whose
# collision term the size policy removes — at 5M docs its candidate
# volume is the known 8.78x/decade blowup, and the policy row (e3)
# carries the decade claim.
#
# Usage: run_x1000_legs.sh [logfile]
set -u
cd /root/repo
LOG="${1:-/tmp/x1000_legs.jsonl}"
GEN=tmp_scale/x1000
WORK=tmp_scale/work_x1000
ALL="d9,d12,e3,e3_fixed_8x8,e5,e5occ,k5,corpus,corpus_sem"

leg() { # leg <name> <legs-to-run (comma)>
  local name="$1" run="$2"
  local skip
  skip=$(echo "$ALL" | tr ',' '\n' | grep -vx -F -e "$(echo "$run" | tr ',' '\n')" | paste -sd,)
  echo "=== leg $name (runs: $run; skip: $skip) $(date -u +%H:%M:%S) ===" >> "$LOG.progress"
  df -h / | tail -1 >> "$LOG.progress"
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_PROBE_SKIP="$skip" \
    sbt -batch "runMain graft.ScaleProbe $GEN $WORK" 2>&1 \
    | tee -a "$LOG.full" | grep '"probe"' \
    | sed "s/^/{\"leg\":\"$name\"} /" >> "$LOG"
  echo "=== leg $name done $(date -u +%H:%M:%S) rc=$? ===" >> "$LOG.progress"
}

rm -rf "$WORK"
: > "$LOG"; : > "$LOG.progress"; : > "$LOG.full"
leg d9d12 "d9,d12"
# the shared sig zone (biggest artifact) is not needed past d9/d12
rm -rf "$WORK/sig_index" "$WORK/clusters"
leg e3 "e3"
rm -rf "$WORK/emb_sig"
leg e5 "e5,e5occ"
rm -rf "$WORK/sem_assign"
leg k5 "k5"
rm -rf "$WORK/ivf"
leg corpus "corpus"
rm -rf "$WORK/wh" "$WORK/in_day1" "$WORK/in_day2"
leg corpus_sem "corpus_sem"
echo "ALL LEGS DONE $(date -u +%H:%M:%S)" >> "$LOG.progress"
