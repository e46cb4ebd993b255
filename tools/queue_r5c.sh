#!/bin/bash
# Round-5 queue, part c (v2): waits for queue_r5b.sh to finish, then
#   8. retries anymal_c_rough finetune (part b's job 5 got a mangled
#      donor path: `ls -t` on multiple orbax ckpt DIRS emits "dir:"
#      header lines — use -d),
#   9. extends the go1 rough flagship run (resume model_2000; the
#      2000-iter r5 rerun at tracking 0.51 was still improving),
#  10. re-renders both runs' evidence on the chip.
set -uo pipefail
cd /root/repo
LOG=logs/r5_queue/queue.log
say() { echo "[queue $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

for i in $(seq 1 720); do
    grep -q "queue_r5b done" "$LOG" && break
    sleep 30
done
grep -q "queue_r5b done" "$LOG" || { say "r5c: timed out waiting for r5b"; exit 1; }

say "job 8: anymal_c_rough finetune retry (correct donor path)"
FLAT_CKPT=$(ls -dt logs/flat_anymal_c/*r5_bootstrap*/model_800.ckpt 2>/dev/null | head -1)
say "  donor: $FLAT_CKPT"
timeout 7200 python -u tools/train_finetune_rough.py --task anymal_c_rough \
    --ckpt "$FLAT_CKPT" --envs 1024 --iters 1500 --trimesh \
    --run_name r5_rough > logs/r5_queue/anymal_c_rough.log 2>&1
say "job 8 rc=$?"

say "job 9: go1 rough extension (resume model_2000, +3000 iters)"
CKPT=$(ls -dt logs/rough_go1/*r5_rough/model_2000.ckpt 2>/dev/null | head -1)
say "  resume: $CKPT"
timeout 5400 python -u tools/train_finetune_rough.py --ckpt "$CKPT" \
    --envs 1800 --iters 3000 --run_name r5_rough_ext \
    > logs/r5_queue/go1_rough_ext.log 2>&1
say "job 9 rc=$?"

say "job 10a: render anymal_c_rough evidence (TPU)"
AC=$(ls -dt logs/rough_anymal_c/*r5_rough*/model_1500.ckpt 2>/dev/null | head -1)
[ -z "$AC" ] && AC=$(ls -dt logs/rough_anymal_c/*r5_rough*/model_*.ckpt 2>/dev/null | head -1)
say "  ckpt: $AC"
timeout 2400 python -u tools/make_run_evidence.py --task anymal_c_rough \
    --ckpt "$AC" --out docs/runs/anymal_c_rough_1024 --vx 0.6 \
    > logs/r5_queue/anymal_c_rough_evidence.log 2>&1
say "job 10a rc=$?"

say "job 10b: render go1 rough evidence (TPU)"
EXT=$(ls -dt logs/rough_go1/*r5_rough_ext*/model_3000.ckpt 2>/dev/null | head -1)
[ -z "$EXT" ] && EXT=$(ls -dt logs/rough_go1/*r5_rough_ext*/model_*.ckpt 2>/dev/null | head -1)
say "  ckpt: $EXT"
timeout 2400 python -u tools/make_run_evidence.py --task go1 --rough \
    --ckpt "$EXT" --out docs/runs/go1_rough_1800 --vx 0.6 \
    > logs/r5_queue/rough_evidence2.log 2>&1
say "job 10b rc=$?"
say "queue_r5c done"
