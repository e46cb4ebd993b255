#!/bin/bash
# Round-5 queue, part d: waits for queue_r5c.sh, then extends anymal_b
# (the 400+800 bootstrap ends at tracking 0.58 still climbing; resume
# its phase-2 checkpoint on the registered config) and re-renders.
set -uo pipefail
cd /root/repo
LOG=logs/r5_queue/queue.log
say() { echo "[queue $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

for i in $(seq 1 720); do
    grep -q "queue_r5c done" "$LOG" && break
    sleep 30
done
grep -q "queue_r5c done" "$LOG" || { say "r5d: timed out waiting for r5c"; exit 1; }

say "job 11: anymal_b extension (resume bootstrap p2 model_800, +1500 iters)"
CKPT=$(ls -dt logs/rough_anymal_b/*r5_bootstrap_p2/model_800.ckpt 2>/dev/null | head -1)
say "  resume: $CKPT"
timeout 7200 python -u tools/train_finetune_rough.py --task anymal_b \
    --ckpt "$CKPT" --envs 1024 --iters 1500 --run_name r5_ext \
    > logs/r5_queue/anymal_b_ext.log 2>&1
say "job 11 rc=$?"

say "job 12: render anymal_b evidence (TPU)"
AB=$(ls -dt logs/rough_anymal_b/*r5_ext*/model_1500.ckpt 2>/dev/null | head -1)
[ -z "$AB" ] && AB=$(ls -dt logs/rough_anymal_b/*r5_ext*/model_*.ckpt 2>/dev/null | head -1)
say "  ckpt: $AB"
timeout 2400 python -u tools/make_run_evidence.py --task anymal_b \
    --ckpt "$AB" --out docs/runs/anymal_b_1024 --vx 0.6 \
    > logs/r5_queue/anymal_b_evidence2.log 2>&1
say "job 12 rc=$?"
say "queue_r5d done"
