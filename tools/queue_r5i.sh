#!/bin/bash
# Round-5 queue, part i: a1 / a1_src from scratch fall into the
# zero-reward stand-still trap (first-update KL ~53, eplen 862 -> 20,
# reward zero-clipped under only_positive_rewards; the deterministic
# policy stands, exploration noise dies). Same trap the two-phase
# bootstrap cured for ANYmal — apply it, then render evidence.
set -uo pipefail
cd /root/repo
LOG=logs/r5_queue/queue.log
say() { echo "[queue $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

for i in $(seq 1 720); do
    grep -q "queue_r5h done" "$LOG" && break
    sleep 30
done
grep -q "queue_r5h done" "$LOG" || { say "r5i: timed out waiting for r5h"; exit 1; }

say "job 25: a1 two-phase bootstrap (1024 envs, 400+1100 iters)"
timeout 7200 python -u tools/train_bootstrap.py --task a1 \
    --envs 1024 --iters1 400 --iters2 1100 \
    --run_name r5_bootstrap > logs/r5_queue/a1_bootstrap.log 2>&1
say "job 25 rc=$?"

say "job 26: render a1 evidence (TPU)"
A1=$(ls -dt logs/rough_a1/*r5_bootstrap_p2/model_*.ckpt 2>/dev/null | head -1)
say "  ckpt: $A1"
timeout 2400 python -u tools/make_run_evidence.py --task a1 \
    --ckpt "$A1" --out docs/runs/a1_1024 --vx 0.6 \
    > logs/r5_queue/a1_evidence2.log 2>&1
say "job 26 rc=$?"
grep achieved logs/r5_queue/a1_evidence2.log | tee -a "$LOG"

say "job 27: a1_src two-phase bootstrap (1024 envs, 400+1100 iters)"
timeout 7200 python -u tools/train_bootstrap.py --task a1_src \
    --envs 1024 --iters1 400 --iters2 1100 \
    --run_name r5_bootstrap > logs/r5_queue/a1_src_bootstrap.log 2>&1
say "job 27 rc=$?"

say "job 28: render a1_src evidence (TPU)"
AS=$(ls -dt logs/rough_a1_src/*r5_bootstrap_p2/model_*.ckpt 2>/dev/null | head -1)
say "  ckpt: $AS"
timeout 2400 python -u tools/make_run_evidence.py --task a1_src \
    --ckpt "$AS" --out docs/runs/a1_src_1024 --vx 0.6 \
    > logs/r5_queue/a1_src_evidence2.log 2>&1
say "job 28 rc=$?"
grep achieved logs/r5_queue/a1_src_evidence2.log | tee -a "$LOG"
say "queue_r5i done"
