"""Benchmarks for every BASELINE.json config family, driver-captured.

Emits one JSON line per configuration — FrozenLake-8x8, Taxi, Pendulum,
MountainCarContinuous, LunarLander, HalfCheetah, Ant, CarRacing — followed
by the CartPole-v1 headline (4096 vectorized envs, random policy, full
trajectory materialization: obs/reward/term/trunc written to HBM every
step). The headline is printed LAST so single-line consumers keep parsing
the same metric as previous rounds.

CartPole uses the fused Pallas rollout kernel
(gymnasium_tpu/ops/pallas_rollout.py) when a TPU is present; the MuJoCo
robots use the fused Pallas articulated substep
(gymnasium_tpu/ops/pallas_articulated.py, auto-engaged on TPU at
block-multiple batch sizes); everything else is the jit(lax.scan) rollout.
Blocks on EVERY output so the numbers are honest (no in-flight work
excluded — see docs/BENCHMARKS.md for the difference-quotient methodology).

Line format: {"metric", "value", "unit", "vs_baseline"} where vs_baseline
is measured steps/s divided by the 50M steps/s/chip north-star target
(BASELINE.md; the reference publishes no per-family numbers, so the
north-star is the common denominator).

Robustness: the TPU backend behind the tunnel can come up UNAVAILABLE or
hang indefinitely during init (observed both). The parent process therefore
never touches JAX itself — all device work runs in child processes under
hard timeouts, and the family child streams its lines so a mid-list hang
still yields every row measured before it. If the TPU headline child fails
or hangs, the parent retries once, then falls back to a CPU child and emits
the xla_scan metric flagged ``"degraded": true`` instead of exiting
non-zero.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

NUM_ENVS = 4096
STEPS_PER_BLOCK = 2048  # TPU; the CPU fallback uses smaller blocks
CPU_STEPS_PER_BLOCK = 256
WARMUP_BLOCKS = 2
# Two block counts: the tunnel's constant sync overhead (~35 ms per forced
# host-read) cancels in the difference quotient between them.
MEASURE_BLOCKS_SMALL = 4
MEASURE_BLOCKS_LARGE = 24
TRIALS = 4
BASELINE_STEPS_PER_S = 50e6

# Child-process wall-clock budgets (seconds). The first TPU attempt covers a
# cold XLA compile (minutes through the tunnel); the retry only happens when
# the first attempt failed FAST (flaky backend init), so it gets less.
TPU_TIMEOUT_S = 900
TPU_RETRY_TIMEOUT_S = 420
CPU_TIMEOUT_S = 900
FAMILIES_TIMEOUT_S = 1800  # 8 configs, each with its own jit compile
FAST_FAILURE_S = 120  # a sub-2-min failure means flaky init, worth a retry

# BASELINE.json config families beyond the CartPole headline. Each row:
# (metric name, module, class, num_envs, steps per rollout, measure target s).
# num_envs=4096 matches the headline scale; Ant/CarRacing use the sizes
# documented in docs/BENCHMARKS.md (Ant also at 4096 = 4 Pallas blocks;
# CarRacing is pixel-bound and benched at 1024).
FAMILY_CASES = [
    ("frozenlake8x8", "gymnasium_tpu.envs.tabular.frozen_lake", "FrozenLake8x8Functional", 4096, 512),
    ("taxi_v3", "gymnasium_tpu.envs.tabular.taxi", "TaxiFunctional", 4096, 512),
    ("pendulum_v1", "gymnasium_tpu.envs.phys2d.pendulum", "PendulumFunctional", 4096, 512),
    ("mountaincar_continuous_v0", "gymnasium_tpu.envs.phys2d.mountain_car", "ContinuousMountainCarFunctional", 4096, 512),
    ("lunarlander_v3", "gymnasium_tpu.envs.box2d.lunar_lander", "LunarLanderFunctional", 4096, 200),
    ("halfcheetah_v5", "gymnasium_tpu.envs.mujoco.half_cheetah", "HalfCheetahFunctional", 4096, 100),
    ("ant_v5", "gymnasium_tpu.envs.mujoco.ant", "AntFunctional", 4096, 100),
    ("carracing_v3", "gymnasium_tpu.envs.box2d.car_racing_functional", "CarRacingFunctional", 1024, 100),
]


# --------------------------------------------------------------------------
# Measurement (runs inside the child process)
# --------------------------------------------------------------------------


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


def _run_scan(jax, steps_per_block):
    from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional
    from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv

    env = JaxVectorEnv(
        CartPoleFunctional(), num_envs=NUM_ENVS, max_episode_steps=500, seed=0
    )
    env.reset()

    import jax.numpy as jnp

    _reduce_outputs = _make_reducer(jax, jnp)

    def run(n_blocks):
        outs = [env.rollout(steps_per_block) for _ in range(n_blocks)]
        return float(_reduce_outputs([outs[-1][1].reward]))

    return run


def _measure(run, steps_per_block=STEPS_PER_BLOCK, target_s: float = 30.0):
    for _ in range(WARMUP_BLOCKS):
        run(1)

    # Adaptive sizing: on TPU a block is milliseconds and this resolves to
    # the documented 4-vs-24-block difference quotient; on a slow host
    # backend the block counts shrink so the whole measurement stays within
    # ~target_s instead of blowing the watchdog budget.
    start = time.perf_counter()
    run(1)
    t_block = time.perf_counter() - start
    n_large = max(3, min(MEASURE_BLOCKS_LARGE, int(target_s / TRIALS / max(t_block, 1e-9))))
    n_small = max(1, min(MEASURE_BLOCKS_SMALL, n_large // 6))

    def timed(n_blocks):
        times = []
        for _ in range(TRIALS):
            start = time.perf_counter()
            run(n_blocks)
            times.append(time.perf_counter() - start)
        times = sorted(times[1:])  # first trial can be served early
        return times[len(times) // 2]

    t_small = timed(n_small)
    t_large = timed(n_large)
    extra_steps = NUM_ENVS * steps_per_block * (n_large - n_small)
    return extra_steps / max(t_large - t_small, 1e-9)


def _emit(path, steps_per_s, degraded=False, metric=None):
    record = {
        "metric": metric or f"cartpole_v1_env_steps_per_s_4096envs_random_policy_{path}",
        "value": round(steps_per_s),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 4),
    }
    if degraded:
        record["degraded"] = True
    print(json.dumps(record), flush=True)


def _bench_families(jax) -> None:
    """One difference-quotient throughput row per BASELINE config family.

    Each row is emitted (flushed) as soon as it is measured so a hang later
    in the list cannot lose it; failures degrade to a value-0 row rather
    than aborting the remainder.
    """
    import importlib
    import statistics

    import jax.numpy as jnp

    from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv

    backend = jax.default_backend()

    @jax.jit
    def reduce_traj(reward):
        return jnp.sum(reward[-1])

    for name, module, cls_name, n, steps in FAMILY_CASES:
        metric = f"{name}_env_steps_per_s_{n}envs_random_policy_{backend}"
        try:
            cls = getattr(importlib.import_module(module), cls_name)
            env = JaxVectorEnv(cls(), num_envs=n, max_episode_steps=1000, seed=0)
            env.reset()

            def timed(repeats, trials=4):
                # repeats carry-chained rollouts ended by ONE host-read of a
                # jitted reduction: block_until_ready through the axon tunnel
                # can return before the device is done, the host-read forces
                # true completion, and timing two repeat counts cancels its
                # ~35 ms constant in the difference quotient.
                times = []
                for _ in range(trials + 1):
                    t0 = time.perf_counter()
                    c = env.carry
                    for _ in range(repeats):
                        c, traj = env.rollout(steps, carry=c, unroll=1)
                    float(reduce_traj(traj.reward))
                    times.append(time.perf_counter() - t0)
                return statistics.median(sorted(times[1:]))

            carry, traj = env.rollout(steps, unroll=1)
            float(reduce_traj(traj.reward))  # warmup + compile
            t1, t4 = timed(1), timed(4)
            rate = 3 * n * steps / max(t4 - t1, 1e-9)
            _emit(name, rate, metric=metric)
        except Exception as exc:  # keep the list going; a 0 row is honest
            print(f"bench: family {name} failed: {exc!r}", file=sys.stderr)
            _emit(name, 0.0, degraded=True, metric=metric)


def _child(mode: str) -> None:
    import jax

    if mode.startswith("cpu"):
        # The axon sitecustomize overwrites JAX_PLATFORMS at interpreter
        # start; the config update is the only reliable way to pin CPU (and
        # avoid hanging in TPU backend init when the tunnel is down).
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    backend = jax.default_backend()
    if mode in ("tpu", "families") and backend in ("cpu", "gpu"):
        # asked for the accelerator path but only a host platform came up —
        # report failure so the parent falls back explicitly
        print(f"bench child: wanted TPU, default backend is {backend}", file=sys.stderr)
        raise SystemExit(3)

    if mode == "families":
        _bench_families(jax)
    elif mode == "tpu":
        # Secondary metric first: bf16 trajectory observations (halves the
        # HBM write traffic of the obs stream). The headline f32 line is
        # printed LAST so single-line consumers pick it up.
        _emit("pallas_fused_bf16obs", _measure(_run_pallas(jax, jnp, jnp.bfloat16)))
        _emit("pallas_fused", _measure(_run_pallas(jax, jnp)))
    else:
        _emit(
            "xla_scan",
            _measure(_run_scan(jax, CPU_STEPS_PER_BLOCK), CPU_STEPS_PER_BLOCK, 20.0),
            degraded=mode == "cpu-degraded",
        )


# --------------------------------------------------------------------------
# Parent watchdog (no JAX imports here)
# --------------------------------------------------------------------------


def _run_child(mode: str, timeout_s: float):
    """Run ``python bench.py --child <mode>`` under a hard timeout.

    Returns (json_lines, elapsed_s, ok). The child is killed (whole process
    group, so nothing keeps holding the TPU) if it exceeds the budget.
    """
    env = dict(os.environ)
    if mode.startswith("cpu"):
        env["JAX_PLATFORMS"] = "cpu"
        # Scrub plugin-injected vars (PJRT_LIBRARY_PATH & co. make a child
        # initialize the TPU tunnel backend despite JAX_PLATFORMS=cpu — and
        # hang when the tunnel is down, which is exactly when the CPU
        # fallback matters).
        for key in list(env):
            if key in ("PJRT_LIBRARY_PATH", "_AXON_REGISTERED") or key.startswith(
                ("TPU_", "AXON_", "PALLAS_AXON_")
            ):
                del env[key]
    start = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", mode],
            env=env,
            capture_output=True,
            text=True,
            timeout=timeout_s,
            start_new_session=True,
        )
        out, rc = proc.stdout, proc.returncode
        if rc != 0:
            tail = (proc.stderr or "")[-2000:]
            print(f"bench: child {mode} rc={rc}\n{tail}", file=sys.stderr)
    except subprocess.TimeoutExpired as exc:
        out, rc = (exc.stdout or ""), -1
        if isinstance(out, bytes):  # TimeoutExpired carries bytes even in text mode
            out = out.decode(errors="replace")
        print(f"bench: child {mode} timed out after {timeout_s}s", file=sys.stderr)
    elapsed = time.perf_counter() - start
    lines = []
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                json.loads(line)
            except ValueError:
                continue
            lines.append(line)
    return lines, elapsed, rc == 0 and bool(lines)


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        _child(sys.argv[2])
        return
    force_cpu = "--cpu" in sys.argv[1:] or os.environ.get("JAX_PLATFORMS", "") == "cpu"

    if not force_cpu:
        # BASELINE config families first (their lines stream out as they are
        # measured; a timeout keeps whatever was captured). The CartPole
        # headline child runs last so its f32 line stays the final one.
        fam_lines, _, fam_ok = _run_child("families", FAMILIES_TIMEOUT_S)
        for line in fam_lines:
            print(line, flush=True)
        if not fam_ok and not fam_lines:
            print("bench: family child produced no rows", file=sys.stderr)

        lines, elapsed, ok = _run_child("tpu", TPU_TIMEOUT_S)
        if not ok and elapsed < FAST_FAILURE_S:
            # flaky backend init, not a slow compile — one retry after a pause
            time.sleep(20)
            lines, elapsed, ok = _run_child("tpu", TPU_RETRY_TIMEOUT_S)
        if ok:
            for line in lines:
                print(line, flush=True)
            return
        print("bench: TPU path unavailable; falling back to CPU", file=sys.stderr)

    mode = "cpu" if force_cpu else "cpu-degraded"
    lines, _, ok = _run_child(mode, CPU_TIMEOUT_S)
    if ok:
        for line in lines:
            print(line, flush=True)
        return
    # last resort: never exit non-zero without a parseable line — the value
    # is honestly zero because nothing could be measured
    _emit("unmeasured", 0.0, degraded=True)


if __name__ == "__main__":
    main()
