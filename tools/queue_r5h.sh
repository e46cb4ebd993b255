#!/bin/bash
# Round-5 queue, part h: cassie arm C — test whether the adaptive-KL
# lr floor is the binding constraint of the 0.30-0.35 plateau
# (docs/CASSIE_NOTES.md). desired_kl 0.03 accepts the observed KL level
# so the rule can raise lr off the 1e-5 floor; entropy stays at the
# winning 0.003. If final tracking beats the committed 0.31, re-render
# the evidence from arm C.
set -uo pipefail
cd /root/repo
LOG=logs/r5_queue/queue.log
say() { echo "[queue $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

for i in $(seq 1 720); do
    grep -q "queue_r5g done" "$LOG" && break
    sleep 30
done
grep -q "queue_r5g done" "$LOG" || { say "r5h: timed out waiting for r5g"; exit 1; }

CKPT=$(ls -dt logs/rough_cassie/*r5_cassie_final/model_12000.ckpt 2>/dev/null | head -1)
say "job 23: cassie arm C (desired_kl 0.03, entropy 0.003, +6000 iters) from $CKPT"
timeout 5400 python -u tools/train_finetune_rough.py --task cassie \
    --ckpt "$CKPT" --envs 4096 --iters 6000 --entropy_coef 0.003 \
    --desired_kl 0.03 --run_name r5_cassie_armC \
    > logs/r5_queue/cassie_armC.log 2>&1
say "job 23 rc=$?"

TC=$(grep -E '^it ' logs/r5_queue/cassie_armC.log | tail -20 | grep -oE 'track [0-9.]+' | awk '{s+=$2; n++} END {print (n? s/n : 0)}')
say "arm C final track ~$TC (committed plateau 0.31)"
if awk -v c="$TC" 'BEGIN {exit !(c > 0.38)}'; then
    say "job 24: arm C beats plateau - re-render cassie evidence"
    CC=$(ls -dt logs/rough_cassie/*r5_cassie_armC*/model_6000.ckpt 2>/dev/null | head -1)
    [ -z "$CC" ] && CC=$(ls -dt logs/rough_cassie/*r5_cassie_armC*/model_*.ckpt 2>/dev/null | head -1)
    timeout 2400 python -u tools/make_run_evidence.py --task cassie \
        --ckpt "$CC" --out docs/runs/cassie_4096 --vx 0.5 \
        > logs/r5_queue/cassie_evidence2.log 2>&1
    say "job 24 rc=$?"
else
    say "arm C does not beat the plateau; keeping committed evidence"
fi
say "queue_r5h done"
