#!/bin/bash
set -x
cd /root/repo
# 1. anymal flat donor (rough-size nets so the policy grafts into 235-dim)
timeout 5400 python - > /tmp/train_anymal_flat.txt 2>&1 <<'PY'
from legged_gym_tpu.utils.cache import setup_jax
setup_jax()
from legged_gym_tpu import registry
from legged_gym_tpu.utils import helpers
helpers.set_seed(1)
cfg, tcfg = registry.get_cfgs("anymal_c_flat")
cfg.env.num_envs = 1024
tcfg.policy.actor_hidden_dims = [512, 256, 128]   # graftable into rough
tcfg.policy.critic_hidden_dims = [512, 256, 128]
tcfg.runner.max_iterations = 800
tcfg.runner.run_name = "r3_anymal_flat_donor"
tcfg.runner.save_interval = 200
env, _ = registry.make_env(cfg=cfg, seed=1)
runner, tcfg = registry.make_runner(env, train_cfg=tcfg)
print(f"log_dir: {runner.log_dir}", flush=True)
runner.learn(tcfg.runner.max_iterations, init_at_random_ep_len=True)
print("done.", flush=True)
PY
# 2. warm-start anymal rough from the donor
CKPT=$(ls -d logs/flat_anymal_c/*r3_anymal_flat_donor | tail -1)/model_800.ckpt
timeout 7200 python tools/train_finetune_rough.py --task anymal_c_rough \
    --ckpt "$CKPT" --envs 1024 --iters 1500 --run_name r3_anymal_rough_ws \
    > /tmp/train_anymal_rough_ws.txt 2>&1
# 3. cassie (trimesh, from scratch — biped has no flat donor recipe)
timeout 7200 python tools/train_flagship.py --task cassie --envs 1024 \
    --iters 1500 --run_name r3_cassie > /tmp/train_cassie.txt 2>&1
# 4. aliengo (flat, its reference terrain)
timeout 5400 python tools/train_smoke.py --tpu --task aliengo --envs 1024 \
    --iters 1000 > /tmp/train_aliengo.txt 2>&1
echo QUEUE_DONE
