"""JAX PPO stack (the rsl_rl equivalent): actor-critic networks, GAE,
clipped-surrogate update with adaptive-KL learning rate, rollout runner."""
