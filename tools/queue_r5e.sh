#!/bin/bash
# Round-5 queue, part e (v2): cassie continuation as an A/B experiment.
# Diagnosis (metrics.jsonl of the 8000-iter r5 run): cassie's action std
# RISES 0.87 -> 1.15 under the reference entropy_coef=0.01 while every
# quadruped anneals to ~0.35, and the adaptive-KL rule throttles lr to
# ~1.7e-5. Arm A continues unchanged; arm B lowers entropy_coef to
# 0.003. The better arm gets a long extension.
set -uo pipefail
cd /root/repo
LOG=logs/r5_queue/queue.log
say() { echo "[queue $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

for i in $(seq 1 720); do
    grep -q "queue_r5d done" "$LOG" && break
    sleep 30
done
grep -q "queue_r5d done" "$LOG" || { say "r5e: timed out waiting for r5d"; exit 1; }

CKPT=$(ls -dt logs/rough_cassie/*r5_cassie/model_8000.ckpt 2>/dev/null | head -1)
[ -z "$CKPT" ] && CKPT=$(ls -dt logs/rough_cassie/*r5_cassie/model_*.ckpt 2>/dev/null | head -1)

say "job 13A: cassie continuation arm A (entropy 0.01, +6000 iters) from $CKPT"
timeout 5400 python -u tools/train_finetune_rough.py --task cassie \
    --ckpt "$CKPT" --envs 4096 --iters 6000 --run_name r5_cassie_extA \
    > logs/r5_queue/cassie_extA.log 2>&1
say "job 13A rc=$?"

say "job 13B: cassie continuation arm B (entropy 0.003, +6000 iters)"
timeout 5400 python -u tools/train_finetune_rough.py --task cassie \
    --ckpt "$CKPT" --envs 4096 --iters 6000 --entropy_coef 0.003 \
    --run_name r5_cassie_extB > logs/r5_queue/cassie_extB.log 2>&1
say "job 13B rc=$?"

# pick the arm with the higher final tracking and extend it
TA=$(grep -E '^it ' logs/r5_queue/cassie_extA.log | tail -20 | grep -oE 'track [0-9.]+' | awk '{s+=$2; n++} END {print (n? s/n : 0)}')
TB=$(grep -E '^it ' logs/r5_queue/cassie_extB.log | tail -20 | grep -oE 'track [0-9.]+' | awk '{s+=$2; n++} END {print (n? s/n : 0)}')
say "arm A final track ~$TA, arm B final track ~$TB"
WINNER=A; EC=""
if awk -v a="$TA" -v b="$TB" 'BEGIN {exit !(b > a)}'; then
    WINNER=B; EC="--entropy_coef 0.003"
fi
WCKPT=$(ls -dt logs/rough_cassie/*r5_cassie_ext${WINNER}*/model_6000.ckpt 2>/dev/null | head -1)
[ -z "$WCKPT" ] && WCKPT=$(ls -dt logs/rough_cassie/*r5_cassie_ext${WINNER}*/model_*.ckpt 2>/dev/null | head -1)
say "job 13C: extending arm $WINNER (+12000 iters) from $WCKPT"
timeout 10800 python -u tools/train_finetune_rough.py --task cassie \
    --ckpt "$WCKPT" --envs 4096 --iters 12000 $EC \
    --run_name r5_cassie_final > logs/r5_queue/cassie_final.log 2>&1
say "job 13C rc=$?"

say "job 14: render cassie evidence (TPU)"
CE=$(ls -dt logs/rough_cassie/*r5_cassie_final*/model_*.ckpt 2>/dev/null | head -1)
say "  ckpt: $CE"
timeout 2400 python -u tools/make_run_evidence.py --task cassie \
    --ckpt "$CE" --out docs/runs/cassie_4096 --vx 0.5 \
    > logs/r5_queue/cassie_evidence.log 2>&1
say "job 14 rc=$?"
say "queue_r5e done"
