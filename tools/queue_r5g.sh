#!/bin/bash
# Round-5 queue, part g: fill the last robot-evidence gap — a1 and
# a1_src flat runs (every other registered task has a committed
# docs/runs entry) — then render.
set -uo pipefail
cd /root/repo
LOG=logs/r5_queue/queue.log
say() { echo "[queue $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

for i in $(seq 1 720); do
    grep -q "queue_r5f done" "$LOG" && break
    sleep 30
done
grep -q "queue_r5f done" "$LOG" || { say "r5g: timed out waiting for r5f"; exit 1; }

say "job 19: a1 flat from scratch (1024 envs, 1500 iters)"
timeout 5400 python -u tools/train_flagship.py --task a1 --envs 1024 \
    --iters 1500 --run_name r5_a1 > logs/r5_queue/a1.log 2>&1
say "job 19 rc=$?"

say "job 20: render a1 evidence (TPU)"
A1=$(ls -dt logs/*a1*/*r5_a1*/model_1500.ckpt 2>/dev/null | head -1)
[ -z "$A1" ] && A1=$(ls -dt logs/*a1*/*r5_a1*/model_*.ckpt 2>/dev/null | head -1)
say "  ckpt: $A1"
timeout 2400 python -u tools/make_run_evidence.py --task a1 \
    --ckpt "$A1" --out docs/runs/a1_1024 --vx 0.6 \
    > logs/r5_queue/a1_evidence.log 2>&1
say "job 20 rc=$?"

say "job 21: a1_src flat from scratch (1024 envs, 1500 iters)"
timeout 5400 python -u tools/train_flagship.py --task a1_src --envs 1024 \
    --iters 1500 --run_name r5_a1src > logs/r5_queue/a1_src.log 2>&1
say "job 21 rc=$?"

say "job 22: render a1_src evidence (TPU)"
AS=$(ls -dt logs/*a1_src*/*r5_a1src*/model_1500.ckpt 2>/dev/null | head -1)
[ -z "$AS" ] && AS=$(ls -dt logs/*a1_src*/*r5_a1src*/model_*.ckpt 2>/dev/null | head -1)
say "  ckpt: $AS"
timeout 2400 python -u tools/make_run_evidence.py --task a1_src \
    --ckpt "$AS" --out docs/runs/a1_src_1024 --vx 0.6 \
    > logs/r5_queue/a1_src_evidence.log 2>&1
say "job 22 rc=$?"
say "queue_r5g done"
