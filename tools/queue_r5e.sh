#!/bin/bash
# Round-5 queue, part e: waits for queue_r5d.sh, then continues cassie
# far past the reference default (the from-scratch curve was still
# rising at 8000 iters; at ~730k steps/s 20000 more iters is ~45 min)
# and re-renders its evidence.
set -uo pipefail
cd /root/repo
LOG=logs/r5_queue/queue.log
say() { echo "[queue $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

for i in $(seq 1 720); do
    grep -q "queue_r5d done" "$LOG" && break
    sleep 30
done
grep -q "queue_r5d done" "$LOG" || { say "r5e: timed out waiting for r5d"; exit 1; }

say "job 13: cassie continuation (resume model_8000, +20000 iters)"
CKPT=$(ls -dt logs/*cassie*/*r5_cassie*/model_8000.ckpt 2>/dev/null | head -1)
[ -z "$CKPT" ] && CKPT=$(ls -dt logs/*cassie*/*r5_cassie*/model_*.ckpt 2>/dev/null | head -1)
say "  resume: $CKPT"
timeout 10800 python -u tools/train_finetune_rough.py --task cassie \
    --ckpt "$CKPT" --envs 4096 --iters 20000 --run_name r5_cassie_ext \
    > logs/r5_queue/cassie_ext.log 2>&1
say "job 13 rc=$?"

say "job 14: render cassie evidence (TPU)"
CE=$(ls -dt logs/*cassie*/*r5_cassie_ext*/model_*.ckpt 2>/dev/null | head -1)
say "  ckpt: $CE"
timeout 2400 python -u tools/make_run_evidence.py --task cassie \
    --ckpt "$CE" --out docs/runs/cassie_4096 --vx 0.5 \
    > logs/r5_queue/cassie_evidence.log 2>&1
say "job 14 rc=$?"
say "queue_r5e done"
