#!/bin/bash
# Round-5 measurement battery (VERDICT r4 items 1-4), run serially on
# the one real chip AFTER scripts/r5_train_pipeline.sh has produced:
#   weights/prop_synthetic.npz     (chain=3 curriculum-trained)
#   weights/prop_synthetic_s1.npz  (single-step snapshot, the A/B)
#   weights/s2m_synthetic.npz
#   weights/fusion_synthetic.npz
#
# Outputs land in /tmp/r5_*.json + /tmp/envelope_arrays*.npz; each
# stage prints a stage banner so the log doubles as the PERF.md source.
set -e
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export PYTHONUNBUFFERED=1

echo "=== m1: envelope, chain-trained prop + trained fusion ($(date +%T)) ==="
python scripts/accuracy_envelope.py --weights weights/prop_synthetic.npz \
    --fusion-weights weights/fusion_synthetic.npz --tag "" \
    | tee /tmp/r5_envelope_chain.json.log

echo "=== m2: envelope, single-step prop (curriculum A/B) ($(date +%T)) ==="
python scripts/accuracy_envelope.py --weights weights/prop_synthetic_s1.npz \
    --fusion-weights weights/fusion_synthetic.npz --tag "_s1" \
    | tee /tmp/r5_envelope_s1.json.log

echo "=== m3: diagnose decided-pixel flips ($(date +%T)) ==="
python scripts/envelope_diagnose.py /tmp/envelope_arrays.npz \
    --out /tmp/r5_envelope_diagnosis.json

# Attribution ablations only if the chain-trained baseline still flips
# decided pixels (each costs a ~10-min chip re-run).
FLIPS=$(python -c "import json; print(json.load(open('/tmp/r5_envelope_diagnosis.json'))['flips'])")
if [ "$FLIPS" != "0" ]; then
  echo "=== m3b: $FLIPS flips -> attribution ablations ($(date +%T)) ==="
  python scripts/accuracy_envelope.py --weights weights/prop_synthetic.npz \
      --fusion-weights weights/fusion_synthetic.npz --tag "_ff32" \
      --fast-fusion-fp32 | tee /tmp/r5_envelope_ff32.json.log
  python scripts/accuracy_envelope.py --weights weights/prop_synthetic.npz \
      --fusion-weights weights/fusion_synthetic.npz --tag "_tf32" \
      --fast-towers-fp32 | tee /tmp/r5_envelope_tf32.json.log
  python scripts/accuracy_envelope.py --weights weights/prop_synthetic.npz \
      --fusion-weights weights/fusion_synthetic.npz --tag "_rr1" \
      --fast-read-refine 1 | tee /tmp/r5_envelope_rr1.json.log
  python scripts/envelope_diagnose.py /tmp/envelope_arrays.npz \
      --ablation fusion_fp32=/tmp/envelope_arrays_ff32.npz \
      --ablation towers_fp32=/tmp/envelope_arrays_tf32.npz \
      --ablation read_refine1=/tmp/envelope_arrays_rr1.npz \
      --out /tmp/r5_envelope_diagnosis.json
else
  echo "=== m3b: zero decided-pixel flips — no ablations needed ==="
fi

# m4-m7 are independent measurements: one failure must not skip the
# rest (especially the headline bench). Collect failures, report last.
set +e
FAILED=""

echo "=== m4: full 8-round protocol, chain-trained nets ($(date +%T)) ==="
python scripts/full_protocol_tpu.py --warmup \
    --out /tmp/r5_full_protocol.json || FAILED="$FAILED m4"

echo "=== m5: NoC trajectory through the full f-BRS stack ($(date +%T)) ==="
python scripts/noc_synthetic.py --train-steps 600 --eval-n 20 \
    --out /tmp/r5_noc.json || FAILED="$FAILED m5"

echo "=== m6: slim-decoder A/B on the chip ($(date +%T)) ==="
python scripts/slim_decoder_bench.py | tee /tmp/r5_slim_decoder.log \
    || FAILED="$FAILED m6"

echo "=== m7: headline bench (preskip decoder) ($(date +%T)) ==="
python bench.py | tee /tmp/r5_bench.log || FAILED="$FAILED m7"

if [ -n "$FAILED" ]; then
  echo "=== R5-MEASURE-PIPELINE-FAILED:$FAILED ($(date +%T)) ==="
  exit 1
fi
echo "=== R5-MEASURE-PIPELINE-OK ($(date +%T)) ==="
