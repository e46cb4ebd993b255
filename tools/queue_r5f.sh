#!/bin/bash
# Round-5 queue, part f: after the cassie arc (part e), push the go1
# rough flagship further (+5000 iters from the part-c extension), then
# re-render its evidence and re-verify the headline bench on the chip.
set -uo pipefail
cd /root/repo
LOG=logs/r5_queue/queue.log
say() { echo "[queue $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

for i in $(seq 1 720); do
    grep -q "queue_r5e done" "$LOG" && break
    sleep 30
done
grep -q "queue_r5e done" "$LOG" || { say "r5f: timed out waiting for r5e"; exit 1; }

say "job 15: go1 rough extension 2 (+5000 iters)"
CKPT=$(ls -dt logs/rough_go1/*r5_rough_ext/model_3000.ckpt 2>/dev/null | head -1)
say "  resume: $CKPT"
timeout 7200 python -u tools/train_finetune_rough.py --ckpt "$CKPT" \
    --envs 1800 --iters 5000 --run_name r5_rough_ext2 \
    > logs/r5_queue/go1_rough_ext2.log 2>&1
say "job 15 rc=$?"

say "job 16: render go1 rough evidence (TPU)"
EXT=$(ls -dt logs/rough_go1/*r5_rough_ext2*/model_5000.ckpt 2>/dev/null | head -1)
[ -z "$EXT" ] && EXT=$(ls -dt logs/rough_go1/*r5_rough_ext2*/model_*.ckpt 2>/dev/null | head -1)
say "  ckpt: $EXT"
timeout 2400 python -u tools/make_run_evidence.py --task go1 --rough \
    --ckpt "$EXT" --out docs/runs/go1_rough_1800 --vx 0.6 \
    > logs/r5_queue/rough_evidence3.log 2>&1
say "job 16 rc=$?"

say "job 17: headline bench re-verification (bench.py on the chip)"
timeout 1800 python -u bench.py > logs/r5_queue/bench_verify.log 2>&1
say "job 17 rc=$?"
tail -1 logs/r5_queue/bench_verify.log | tee -a "$LOG"

say "job 18: training bench re-verification (bench_train.py)"
timeout 1800 python -u bench_train.py > logs/r5_queue/bench_train_verify.log 2>&1
say "job 18 rc=$?"
tail -1 logs/r5_queue/bench_train_verify.log | tee -a "$LOG"
say "queue_r5f done"
