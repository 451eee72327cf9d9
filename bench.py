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
STEPS_PER_BLOCK = 2048
WARMUP_BLOCKS = 2
# Two block counts: the tunnel's constant sync overhead (~35 ms per forced
# host-read) cancels in the difference quotient between them.
MEASURE_BLOCKS_SMALL = 4
MEASURE_BLOCKS_LARGE = 24
TRIALS = 4
BASELINE_STEPS_PER_S = 50e6


def _make_reducer(jax, jnp):
    @jax.jit
    def _reduce(outs):
        leaves = jax.tree_util.tree_leaves(outs)
        return sum(jnp.sum(leaf[..., -1].astype(jnp.float32)) for leaf in leaves)

    return _reduce


def _run_pallas(jax, jnp, obs_dtype=None):
    from gymnasium_tpu.ops import cartpole_rollout_fused

    _reduce_outputs = _make_reducer(jax, jnp)

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

    def run(n_blocks):
        outs = []
        carry = (state, steps, done)
        for b in range(n_blocks):
            carry, out = block(b, carry)
            outs.append(out)
        # through the axon tunnel block_until_ready can return before the
        # device is done; ONE host-read of a jitted reduction over the LAST
        # block's outputs forces true completion (blocks are sequentially
        # dependent through the carry, so the last implies all)
        return float(_reduce_outputs(outs[-1]))

    return run


def _run_scan(jax):
    from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional
    from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv

    env = JaxVectorEnv(
        CartPoleFunctional(), num_envs=NUM_ENVS, max_episode_steps=500, seed=0
    )
    env.reset()

    import jax.numpy as jnp

    _reduce_outputs = _make_reducer(jax, jnp)

    def run(n_blocks):
        outs = [env.rollout(STEPS_PER_BLOCK) for _ in range(n_blocks)]
        return float(_reduce_outputs([outs[-1][1].reward]))

    return run


def main() -> None:
    import jax
    import jax.numpy as jnp

    def measure(run):
        for _ in range(WARMUP_BLOCKS):
            run(1)

        def timed(n_blocks):
            times = []
            for _ in range(TRIALS):
                start = time.perf_counter()
                run(n_blocks)
                times.append(time.perf_counter() - start)
            times = sorted(times[1:])  # first trial can be served early
            return times[len(times) // 2]

        t_small = timed(MEASURE_BLOCKS_SMALL)
        t_large = timed(MEASURE_BLOCKS_LARGE)
        extra_steps = (
            NUM_ENVS * STEPS_PER_BLOCK * (MEASURE_BLOCKS_LARGE - MEASURE_BLOCKS_SMALL)
        )
        return extra_steps / max(t_large - t_small, 1e-9)

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
