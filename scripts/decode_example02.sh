#!/bin/bash
# Example-02 decode stage (the reference's decode.sh): GMM-bypass posterior
# features -> SVite phone-loop decode -> SResults scoring, for the 1-state
# phone setup the TIMIT recipe uses (NumStates=3 HMMs with one emitting
# state per phone).
#
# Usage: decode_example02.sh <trained_mmf> <example02_workdir>
set -e

NNET=${1:?usage: decode_example02.sh <trained_mmf> <workdir>}
W=${2:?usage: decode_example02.sh <trained_mmf> <workdir>}
REPO=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH=$REPO${PYTHONPATH:+:$PYTHONPATH}
STK=${STK:-/tmp/stk}
D=$W/decode
FRM_EXT=15

# build SVite/SResults from the vendored STK trunk if missing (same block
# as decode_example01.sh)
STK=$STK bash "$(dirname "$0")/build_stk.sh"

mkdir -p $D/posteriors
PHONES=$W/workdir/dicts/phones
FEATURE_TRANSFORM=$(ls $W/tr_*.transf | head -1)

sed 's/.*/& &/' $PHONES > $D/dict
python -m nnet_asr_tpu.tools.gen_phone_loop $PHONES $D/phoneloop.net
# 1-state phones: tags have no _s suffix -> one emitting state per HMM
python -m nnet_asr_tpu.tools.gen_gmmbypass $PHONES $D/HTK_gmmbypass.mmf

python -m nnet_asr_tpu.tools.tfeacat \
  -S $W/workdir/lists/cv_fea.scp -H "$NNET" -l $D/posteriors -y htk_post \
  --FEATURETRANSFORM=$FEATURE_TRANSFORM --GMMBYPASS=true \
  --START-FRM-EXT=$FRM_EXT --END-FRM-EXT=$FRM_EXT
ls $D/posteriors/* > $D/posteriors.scp

# word-insertion penalty: the reference decode.sh uses HVite -p -1
# (1-state phones insert rampantly without it); -3 won a small grid on the
# stand-in corpus (Acc 29.0 vs 11.7 at -1); override with PENALTY=
$STK/SVite -T 0 -w $D/phoneloop.net -S $D/posteriors.scp \
  -p ${PENALTY:--3} \
  -H $D/HTK_gmmbypass.mmf -i $D/cv_hyp.mlf -l '*' -y rec -P HTK \
  --HTKCOMPAT=TRUE $D/dict $PHONES

echo "=== STK SResults ==="
$STK/SResults -I $W/workdir/mlfs/ref.mlf $PHONES $D/cv_hyp.mlf | tail -4
echo "=== nnet_asr_tpu sresults ==="
python -m nnet_asr_tpu.tools.sresults \
  -I $W/workdir/mlfs/ref.mlf $PHONES $D/cv_hyp.mlf
