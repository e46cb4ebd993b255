#!/bin/bash
# Round-3 evidence queue: one training per remaining robot family,
# sequential on the single chip. Run from the repo root.
set -x
T=/root/repo/tools
timeout 7200 python $T/train_flagship.py --task anymal_c_rough --envs 1024 \
    --iters 1500 --trimesh --run_name r3_anymal_rough \
    > /tmp/train_anymal_rough.txt 2>&1
timeout 7200 python $T/train_flagship.py --task cassie --envs 1024 \
    --iters 1500 --trimesh --run_name r3_cassie \
    > /tmp/train_cassie.txt 2>&1
timeout 5400 python $T/train_smoke.py --tpu --task aliengo --envs 1024 \
    --iters 1000 > /tmp/train_aliengo.txt 2>&1
echo QUEUE_DONE
