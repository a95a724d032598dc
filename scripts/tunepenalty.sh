#!/bin/bash
# Word-insertion-penalty grid search (tools/tunepenalty equivalent):
# re-decodes the posterior SCP at each penalty and reports accuracy,
# then prints the best.
#
# Usage: tunepenalty.sh <posteriors.scp> <bypass.mmf> <phoneloop.net> \
#          <dict> <phones> <ref.mlf> [penalties...]
set -e
SCP=${1:?}; MMF=${2:?}; NET=${3:?}; DICT=${4:?}; PHONES=${5:?}; REF=${6:?}
shift 6
PENALTIES=${@:-"-6 -4 -2 0 2"}
STK=${STK:-/tmp/stk}
D=$(mktemp -d)

best_acc=-1e9; best_p=0
for p in $PENALTIES; do
  $STK/SVite -T 0 -w $NET -S $SCP -H $MMF -i $D/hyp_$p.mlf \
    -l '*' -y rec -P HTK -p $p --HTKCOMPAT=TRUE $DICT $PHONES \
    > /dev/null 2>&1
  line=$(PYTHONPATH=/root/repo python -m nnet_asr_tpu.tools.sresults \
    -I $REF $PHONES $D/hyp_$p.mlf 2>/dev/null | grep WORD)
  acc=$(echo "$line" | sed 's/.*Acc=\([-0-9.]*\).*/\1/')
  echo "penalty $p: $line"
  better=$(python -c "print(1 if $acc > $best_acc else 0)")
  if [ "$better" = "1" ]; then best_acc=$acc; best_p=$p; fi
done
echo "BEST: penalty=$best_p Acc=$best_acc"
