#!/bin/bash
# Round-5 queue, part j: the a1/a1_src bootstraps escape the trap
# (eplen 1001) but are young at 1100 phase-2 iters; extend each +2000
# and re-render.
set -uo pipefail
cd /root/repo
LOG=logs/r5_queue/queue.log
say() { echo "[queue $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

for i in $(seq 1 720); do
    grep -q "queue_r5i done" "$LOG" && break
    sleep 30
done
grep -q "queue_r5i done" "$LOG" || { say "r5j: timed out waiting for r5i"; exit 1; }

say "job 29: a1 extension (+2000 iters)"
CKPT=$(ls -dt logs/rough_a1/*r5_bootstrap_p2/model_*.ckpt 2>/dev/null | head -1)
say "  resume: $CKPT"
timeout 5400 python -u tools/train_finetune_rough.py --task a1 \
    --ckpt "$CKPT" --envs 1024 --iters 2000 --run_name r5_ext \
    > logs/r5_queue/a1_ext.log 2>&1
say "job 29 rc=$?"

say "job 30: render a1 evidence (TPU)"
A1=$(ls -dt logs/rough_a1/*r5_ext*/model_2000.ckpt 2>/dev/null | head -1)
[ -z "$A1" ] && A1=$(ls -dt logs/rough_a1/*r5_ext*/model_*.ckpt 2>/dev/null | head -1)
say "  ckpt: $A1"
timeout 2400 python -u tools/make_run_evidence.py --task a1 \
    --ckpt "$A1" --out docs/runs/a1_1024 --vx 0.6 \
    > logs/r5_queue/a1_evidence3.log 2>&1
say "job 30 rc=$?"
grep achieved logs/r5_queue/a1_evidence3.log | tee -a "$LOG"

say "job 31: a1_src extension (+2000 iters)"
CKPT=$(ls -dt logs/rough_a1_src/*r5_bootstrap_p2/model_*.ckpt 2>/dev/null | head -1)
say "  resume: $CKPT"
timeout 5400 python -u tools/train_finetune_rough.py --task a1_src \
    --ckpt "$CKPT" --envs 1024 --iters 2000 --run_name r5_ext \
    > logs/r5_queue/a1_src_ext.log 2>&1
say "job 31 rc=$?"

say "job 32: render a1_src evidence (TPU)"
AS=$(ls -dt logs/rough_a1_src/*r5_ext*/model_2000.ckpt 2>/dev/null | head -1)
[ -z "$AS" ] && AS=$(ls -dt logs/rough_a1_src/*r5_ext*/model_*.ckpt 2>/dev/null | head -1)
say "  ckpt: $AS"
timeout 2400 python -u tools/make_run_evidence.py --task a1_src \
    --ckpt "$AS" --out docs/runs/a1_src_1024 --vx 0.6 \
    > logs/r5_queue/a1_src_evidence3.log 2>&1
say "job 32 rc=$?"
grep achieved logs/r5_queue/a1_src_evidence3.log | tee -a "$LOG"
say "queue_r5j done"
