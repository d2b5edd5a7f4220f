#!/bin/bash
# Round-5 training pipeline (VERDICT r4 item 1): rebuild all synthetic
# artifacts on the real chip, including the chain_steps>=2 exposure-bias
# curriculum for the propagation net, keeping the single-step artifact
# as weights/prop_synthetic_s1.npz for the A/B.
#
# Stages (all through the real CLIs):
#   1. prop chain=1  500 @192^2       lr 2e-4   (bootstrap)
#   2. prop chain=1 2000 @256x448     lr 1e-4   (r3/r4 baseline recipe)
#      -> snapshot prop_synthetic_s1.npz
#   3. prop chain=3  800 @256x448     lr 1e-4   (BPTT curriculum: memorize
#      own aggregated predictions for 3 chained steps)
#   4. s2m           500 @192^2       lr 2e-4
#   5. fusion        800 iters, generate_fusion + train.py stage 1 with
#      the CHAIN-trained prop net
set -e
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
export PYTHONUNBUFFERED=1
P=scripts/pretrain_synthetic.py

echo "=== stage 1: prop chain=1 bootstrap @192 ($(date +%T)) ==="
python $P --net prop --steps 500 --hw 192 --lr 2e-4 --chain 1 --seed 1000

echo "=== stage 2: prop chain=1 @256x448 ($(date +%T)) ==="
python $P --net prop --steps 2000 --hw 256 448 --lr 1e-4 --chain 1 \
    --seed 2000 --resume
cp weights/prop_synthetic.npz weights/prop_synthetic_s1.npz
echo "snapshotted single-step artifact -> weights/prop_synthetic_s1.npz"

echo "=== stage 3: prop chain=3 curriculum @256x448 ($(date +%T)) ==="
python $P --net prop --steps 800 --hw 256 448 --lr 1e-4 --chain 3 \
    --seed 5000 --resume

echo "=== stage 4: s2m @192 ($(date +%T)) ==="
python $P --net s2m --steps 500 --hw 192 --lr 2e-4 --seed 1000

echo "=== stage 5: fusion (chain-trained prop) ($(date +%T)) ==="
python scripts/train_fusion_synthetic.py --iterations 800

echo "=== R5-TRAIN-PIPELINE-OK ($(date +%T)) ==="
