#!/bin/bash
# Round-5 queue continuation: jobs 4-7 (queue_r5.sh died with the session
# after job 3). Sequential (one chip). Logs under logs/r5_queue/.
set -uo pipefail
cd /root/repo
mkdir -p logs/r5_queue
LOG=logs/r5_queue/queue.log

say() { echo "[queue $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

say "job 4 (retry): anymal_b bootstrap (rough cfg, 1024 envs, 400+800 iters)"
timeout 7200 python -u tools/train_bootstrap.py --task anymal_b \
    --envs 1024 --iters1 400 --iters2 800 --wide_nets \
    --run_name r5_bootstrap > logs/r5_queue/anymal_b.log 2>&1
say "job 4 rc=$?"

say "job 5: anymal_c_rough finetune from flat bootstrap"
FLAT_CKPT=$(ls -t logs/flat_anymal_c/*r5_bootstrap*/model_1200.ckpt 2>/dev/null | head -1)
if [ -z "$FLAT_CKPT" ]; then
    FLAT_CKPT=$(ls -t logs/flat_anymal_c/*r5_bootstrap*/model_*.ckpt 2>/dev/null | head -1)
fi
say "  donor: $FLAT_CKPT"
timeout 7200 python -u tools/train_finetune_rough.py --task anymal_c_rough \
    --ckpt "$FLAT_CKPT" --envs 1024 --iters 1500 --trimesh \
    --run_name r5_rough > logs/r5_queue/anymal_c_rough.log 2>&1
say "job 5 rc=$?"

say "job 6: cassie from scratch, reference scale (4096 envs, 8000 iters)"
timeout 10800 python -u tools/train_flagship.py --task cassie --envs 4096 \
    --iters 8000 --run_name r5_cassie > logs/r5_queue/cassie.log 2>&1
say "job 6 rc=$?"

say "job 7: MPC bench on the real chip"
timeout 3600 python -u bench_mpc.py --out BENCH_MPC_r05.json > logs/r5_queue/bench_mpc.log 2>&1
say "job 7 rc=$?"

say "queue_r5b done"
