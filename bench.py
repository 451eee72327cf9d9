"""Headline benchmark: CartPole-v1 throughput, 4096 vectorized envs,
random policy, full trajectory materialization (obs/reward/term/trunc
written to HBM every step — learner-usable rollouts, not bare stepping).

Uses the fused Pallas rollout kernel (gymnasium_tpu/ops/pallas_rollout.py)
when a TPU is present, falling back to the jit(lax.scan) path otherwise.
Blocks on EVERY output so the number is honest (no in-flight work excluded).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is measured steps/s divided by the 50M steps/s/chip north-star
target (BASELINE.md).
"""

from __future__ import annotations

import json
import time

NUM_ENVS = 4096
STEPS_PER_BLOCK = 1024
WARMUP_BLOCKS = 2
MEASURE_BLOCKS = 8
TRIALS = 5
BASELINE_STEPS_PER_S = 50e6


def _run_pallas(jax, jnp, obs_dtype=None):
    from gymnasium_tpu.ops import cartpole_rollout_fused

    obs_dtype = obs_dtype or jnp.float32
    state = jnp.zeros((4, NUM_ENVS), jnp.float32)
    steps = jnp.zeros((NUM_ENVS,), jnp.int32)
    done = jnp.zeros((NUM_ENVS,), bool)

    def block(seed, carry):
        st, sp, dn = carry
        out = cartpole_rollout_fused(
            st, sp, dn, seed, STEPS_PER_BLOCK, obs_dtype=obs_dtype
        )
        return (out[0], out[1], out[2]), out

    def run():
        outs = []
        carry = (state, steps, done)
        for b in range(MEASURE_BLOCKS):
            carry, out = block(b, carry)
            outs.append(out)
        jax.block_until_ready(outs)

    return run


def _run_scan(jax):
    from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional
    from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv

    env = JaxVectorEnv(
        CartPoleFunctional(), num_envs=NUM_ENVS, max_episode_steps=500, seed=0
    )
    env.reset()

    def run():
        outs = [env.rollout(STEPS_PER_BLOCK) for _ in range(MEASURE_BLOCKS)]
        jax.block_until_ready(outs)

    return run


def main() -> None:
    import jax
    import jax.numpy as jnp

    def measure(run):
        for _ in range(WARMUP_BLOCKS):
            run()
        rates = []
        for _ in range(TRIALS):
            start = time.perf_counter()
            run()
            elapsed = time.perf_counter() - start
            rates.append(NUM_ENVS * STEPS_PER_BLOCK * MEASURE_BLOCKS / elapsed)
        return sorted(rates)[len(rates) // 2]

    def emit(path, steps_per_s):
        print(
            json.dumps(
                {
                    "metric": f"cartpole_v1_env_steps_per_s_4096envs_random_policy_{path}",
                    "value": round(steps_per_s),
                    "unit": "env-steps/s",
                    "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 4),
                }
            )
        )

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if on_tpu:
        # Secondary metric first: bf16 trajectory observations (halves the
        # HBM write traffic of the obs stream). The headline f32 line is
        # printed LAST so single-line consumers pick it up.
        emit("pallas_fused_bf16obs", measure(_run_pallas(jax, jnp, jnp.bfloat16)))
        emit("pallas_fused", measure(_run_pallas(jax, jnp)))
    else:
        emit("xla_scan", measure(_run_scan(jax)))


if __name__ == "__main__":
    main()
