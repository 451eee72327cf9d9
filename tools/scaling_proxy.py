"""Scaling-efficiency proxy: per-device HLO invariance as the mesh grows.

Real multi-chip hardware is unavailable in CI (single tunnel chip), so the
≥90%-scaling-efficiency north star (BASELINE.md) is tracked through a
compile-time proxy measured on virtual host devices:

- **env rollout step** (dp-sharded JaxVectorEnv autoreset step): must lower
  to ZERO cross-device collectives at every mesh size (each device steps its
  own lanes; nothing to communicate), with per-device FLOPs scaling as 1/n.
- **PPO train step** (dp-sharded env batch, replicated learner): the
  collective COUNT must be constant across mesh sizes (one gradient
  all-reduce set, independent of how many devices share it), with
  per-device FLOPs scaling as ~1/n.

A program with those properties spends a constant, batch-independent amount
of time in communication per step, which is what ≥90% weak scaling requires
once the per-device batch is compute-bound. Collective overhead that grows
with the mesh (e.g. accidental all-gathers of the env state) shows up here
as a count that increases with n — the exact failure mode shard-shape
invariance tests (tests/test_sharding.py) cannot see.

Writes SCALING_PROXY.json at the repo root. Run:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/scaling_proxy.py
"""

from __future__ import annotations

import json
import os
import re
import sys

MESH_SIZES = (1, 2, 4, 8)
COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def count_collectives(hlo_text: str) -> dict[str, int]:
    """Occurrences of each collective HLO op (start/done variants folded)."""
    counts = {}
    for op in COLLECTIVE_OPS:
        # match `op` and `op-start` as instruction names, not substrings of
        # metadata; HLO prints instructions as `%name = bf16[...] all-reduce(`
        counts[op] = len(re.findall(rf"= \S+ {op}(?:-start)?\(", hlo_text))
    return counts


def _expand_replica_groups(spec: str) -> list[list[int]]:
    """Expand an HLO ``replica_groups=`` spec into explicit device groups.

    Handles the explicit form ``{{0,1},{2,3}}`` and the iota form
    ``[G,S]<=[d0,d1,...]T(p...)`` (reshape ``arange(prod(d))`` to ``d``,
    transpose by ``p``, flatten, reshape to ``(G, S)``)."""
    import numpy as np

    spec = spec.strip()
    if spec.startswith("{"):
        groups = []
        for grp in re.findall(r"\{([0-9,\s]+)\}", spec):
            groups.append([int(v) for v in grp.split(",") if v.strip()])
        return groups
    m = re.match(r"\[([0-9,]+)\]<=\[([0-9,]+)\](?:T\(([0-9,]+)\))?", spec)
    assert m, f"unrecognized replica_groups spec: {spec!r}"
    out_shape = [int(v) for v in m.group(1).split(",")]
    iota_shape = [int(v) for v in m.group(2).split(",")]
    ids = np.arange(int(np.prod(iota_shape))).reshape(iota_shape)
    if m.group(3):
        ids = ids.transpose([int(v) for v in m.group(3).split(",")])
    return ids.reshape(out_shape).tolist()


def count_collectives_by_axis(hlo_text: str, hosts: int, chips: int) -> dict:
    """Classify each collective by which mesh axis its groups span.

    Device ``d`` sits at ``(host, chip) = divmod(d, chips)`` (row-major
    two-level mesh). A group spanning several hosts but one chip column is
    DCN traffic; several chips within one host is ICI; both is hierarchical
    (XLA's usual full-mesh all-reduce)."""
    out = {"hosts": 0, "chips": 0, "both": 0, "intra": 0}
    pattern = (
        r"= \S+ (?:"
        + "|".join(COLLECTIVE_OPS)
        + r")(?:-start)?\([^\n]*?replica_groups=(\{\{[^=]*?\}\}|\[[0-9,]+\]<=\[[0-9,]+\](?:T\([0-9,]+\))?)"
    )
    for spec in re.findall(pattern, hlo_text):
        for group in _expand_replica_groups(spec):
            if len(group) <= 1:
                out["intra"] += 1
                continue
            h_span = len({d // chips for d in group}) > 1
            c_span = len({d % chips for d in group}) > 1
            key = "both" if (h_span and c_span) else ("hosts" if h_span else "chips")
            out[key] += 1
            break  # one classification per instruction (groups are uniform)
    return out


def _flops(compiled) -> float:
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def analyze_env_step(devices, num_envs_total: int, family: str = "cartpole") -> dict:
    import jax

    from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv

    if family == "articulated":
        # the hardest env family: the full articulated-engine substep
        # (FK/Jacobians/mass/bias/contacts/solve) under the same dp sharding
        from gymnasium_tpu.envs.mujoco.half_cheetah import HalfCheetahFunctional

        func_env = HalfCheetahFunctional()
        act_dtype = jax.numpy.float32
        act_shape = (num_envs_total, 6)
    else:
        from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional

        func_env = CartPoleFunctional()
        act_dtype = jax.numpy.int32
        act_shape = (num_envs_total,)

    mesh = jax.sharding.Mesh(devices, ("dp",))
    sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp"))
    env = JaxVectorEnv(
        func_env,
        num_envs=num_envs_total,
        max_episode_steps=64,
        seed=0,
        sharding=sharding if len(devices) > 1 else None,
    )
    env.reset(seed=0)
    actions = jax.device_put(
        jax.numpy.zeros(act_shape, act_dtype),
        sharding if len(devices) > 1 else devices[0],
    )
    compiled = jax.jit(env._make_step()).lower(env.carry, actions).compile()
    return {
        "collectives": count_collectives(compiled.as_text()),
        "flops_per_device": _flops(compiled),
    }


def analyze_ppo_step(devices, num_envs_total: int) -> dict:
    import jax

    from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional
    from gymnasium_tpu.parallel import make_mesh, shard_ppo_state
    from gymnasium_tpu.train.ppo import PPOConfig, init_ppo, make_train_step

    mesh = make_mesh(devices, tp=1)
    func_env = CartPoleFunctional()
    config = PPOConfig(
        num_envs=num_envs_total,
        rollout_steps=8,
        hidden_sizes=(32, 32),
        num_minibatches=2,
        update_epochs=1,
        max_episode_steps=32,
    )
    state, env_params, tx = init_ppo(func_env, config, jax.random.PRNGKey(0))
    state = shard_ppo_state(state, mesh)
    train_step = jax.jit(make_train_step(func_env, config, env_params, tx))
    ctx = (
        jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh
    )
    with ctx:
        compiled = train_step.lower(state).compile()
    return {
        "collectives": count_collectives(compiled.as_text()),
        "flops_per_device": _flops(compiled),
    }


def analyze_two_level(devices, hosts: int, num_envs_total: int) -> dict:
    """The SURVEY §5.8 multi-host story on a ``Mesh(("hosts","chips"))``:

    - env step: env batch sharded over BOTH axes must lower to ZERO
      collectives on either axis (each device steps its own lanes; ICI and
      DCN both idle during rollout);
    - PPO train step: learner gradient all-reduces span both axes (XLA
      reduces hierarchically — ICI first, DCN across hosts);
    - trajectory egress: gathering a two-level-sharded trajectory to the
      replicated learner layout is all-gather traffic on both axes.
    """
    import jax
    import jax.numpy as jnp

    from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional
    from gymnasium_tpu.parallel import make_mesh_two_level, replicated, shard_ppo_state
    from gymnasium_tpu.train.ppo import PPOConfig, init_ppo, make_train_step
    from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv

    chips = len(devices) // hosts
    mesh = make_mesh_two_level(devices, hosts=hosts)
    P = jax.sharding.PartitionSpec
    env_sharding = jax.sharding.NamedSharding(mesh, P(("hosts", "chips")))

    # --- env rollout step: zero collectives on either axis -----------------
    env = JaxVectorEnv(
        CartPoleFunctional(),
        num_envs=num_envs_total,
        max_episode_steps=64,
        seed=0,
        sharding=env_sharding,
    )
    env.reset(seed=0)
    actions = jax.device_put(jnp.zeros((num_envs_total,), jnp.int32), env_sharding)
    step_hlo = jax.jit(env._make_step()).lower(env.carry, actions).compile().as_text()

    # --- PPO train step over the two-level mesh ----------------------------
    config = PPOConfig(
        num_envs=num_envs_total,
        rollout_steps=8,
        hidden_sizes=(32, 32),
        num_minibatches=2,
        update_epochs=1,
        max_episode_steps=32,
    )
    func_env = CartPoleFunctional()
    state, env_params, tx = init_ppo(func_env, config, jax.random.PRNGKey(0))
    state = shard_ppo_state(state, mesh, axis=("hosts", "chips"))
    train_step = jax.jit(make_train_step(func_env, config, env_params, tx))
    ctx = jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh
    with ctx:
        ppo_hlo = train_step.lower(state).compile().as_text()

    # --- trajectory egress: sharded rollout -> replicated learner ----------
    traj = jax.device_put(
        jnp.zeros((num_envs_total, 8, 4), jnp.float32), env_sharding
    )
    egress = (
        jax.jit(lambda t: t, out_shardings=replicated(mesh))
        .lower(traj)
        .compile()
        .as_text()
    )

    return {
        "hosts": hosts,
        "chips": chips,
        "env_step": {
            "collectives": count_collectives(step_hlo),
            "by_axis": count_collectives_by_axis(step_hlo, hosts, chips),
        },
        "ppo_train_step": {
            "collectives": count_collectives(ppo_hlo),
            "by_axis": count_collectives_by_axis(ppo_hlo, hosts, chips),
        },
        "trajectory_egress": {
            "collectives": count_collectives(egress),
            "by_axis": count_collectives_by_axis(egress, hosts, chips),
        },
    }


def wallclock_weak_scaling(mesh_sizes, per_device_envs: int = 512, steps: int = 64) -> dict:
    """Secondary wall-clock signal: fixed TOTAL work per device as the mesh
    grows (weak scaling). On the single-core virtual CPU mesh, total work
    grows with n and the wall-clock grows with it, so the honest derived
    quantity is the PARTITION OVERHEAD: t(n) / (n · t(1)) — 1.0 means the
    n-way-sharded program costs exactly n single-device programs (no
    sharding-induced extra work or communication); values well above 1
    flag overhead real hardware would also pay. Real weak-scaling wall-clock
    needs real chips (the driver's bench covers 1-chip throughput)."""
    import time

    import jax
    import jax.numpy as jnp

    from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional
    from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv

    cpu = jax.devices("cpu")
    out = {}
    t1 = None
    for n in mesh_sizes:
        devs = cpu[:n]
        num_envs = per_device_envs * n
        sharding = None
        if n > 1:
            mesh = jax.sharding.Mesh(
                __import__("numpy").asarray(devs).reshape(max(n // 4, 1), -1),
                ("hosts", "chips"),
            )
            sharding = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(("hosts", "chips"))
            )
        env = JaxVectorEnv(
            CartPoleFunctional(),
            num_envs=num_envs,
            max_episode_steps=500,
            seed=0,
            sharding=sharding,
        )
        env.reset(seed=0)
        carry, traj = env.rollout(steps, unroll=1)
        jax.block_until_ready(carry)
        t0 = time.perf_counter()
        for _ in range(3):
            carry, traj = env.rollout(steps, carry=carry, unroll=1)
        jax.block_until_ready(carry)
        dt = (time.perf_counter() - t0) / 3
        if t1 is None:
            t1 = dt
        out[str(n)] = {
            "per_device_envs": per_device_envs,
            "wall_s": round(dt, 4),
            "partition_overhead": round(dt / (n * t1), 4),
        }
    return out


def build_report(num_envs_total: int = 64) -> dict:
    import jax

    cpu = jax.devices("cpu")
    assert len(cpu) >= max(MESH_SIZES), (
        f"need {max(MESH_SIZES)} virtual devices, found {len(cpu)}; set "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    report: dict = {
        "num_envs_total": num_envs_total,
        "mesh_sizes": list(MESH_SIZES),
        "env_step": {},
        "articulated_env_step": {},
        "ppo_train_step": {},
    }
    for n in MESH_SIZES:
        devs = cpu[:n]
        report["env_step"][str(n)] = analyze_env_step(devs, num_envs_total)
        report["articulated_env_step"][str(n)] = analyze_env_step(
            devs, num_envs_total, family="articulated"
        )
        report["ppo_train_step"][str(n)] = analyze_ppo_step(devs, num_envs_total)
    # two-level hosts x chips factorizations of the full 8-device mesh
    report["two_level"] = {
        f"{hosts}x{8 // hosts}": analyze_two_level(cpu[:8], hosts, num_envs_total)
        for hosts in (2, 4)
    }
    report["wallclock_weak_scaling"] = wallclock_weak_scaling(MESH_SIZES)
    return report


def check_report(report: dict) -> list[str]:
    """Invariants the proxy asserts; returns a list of violations."""
    problems = []
    for section in ("env_step", "articulated_env_step"):
        for n, entry in report.get(section, {}).items():
            total = sum(entry["collectives"].values())
            if total != 0:
                problems.append(f"{section} at mesh={n}: {total} collectives (want 0)")
    for label, entry in report.get("two_level", {}).items():
        env_total = sum(entry["env_step"]["collectives"].values())
        if env_total != 0:
            problems.append(
                f"two_level {label} env_step: {env_total} collectives (want 0 on "
                "both hosts and chips axes)"
            )
        ppo_axes = entry["ppo_train_step"]["by_axis"]
        if ppo_axes["both"] + ppo_axes["hosts"] + ppo_axes["chips"] == 0:
            problems.append(
                f"two_level {label} ppo_train_step: no learner all-reduce found"
            )
        egress = entry["trajectory_egress"]["collectives"]
        if egress.get("all-gather", 0) < 1:
            problems.append(
                f"two_level {label} trajectory_egress: expected an all-gather"
            )
    ppo = report["ppo_train_step"]
    multi = {n: e for n, e in ppo.items() if int(n) > 1}
    counts = {n: sum(e["collectives"].values()) for n, e in multi.items()}
    if len(set(counts.values())) > 1:
        problems.append(f"ppo_train_step collective count varies with mesh: {counts}")
    # per-device flops must fall as the mesh grows (weak-scaling headroom);
    # CartPole steps are tiny, so allow generous constant overhead
    for section in ("env_step", "articulated_env_step", "ppo_train_step"):
        f1 = report[section]["1"]["flops_per_device"]
        f8 = report[section][str(max(report["mesh_sizes"]))]["flops_per_device"]
        if f1 > 0 and not f8 <= 0.55 * f1:
            problems.append(
                f"{section}: per-device flops do not shrink with the mesh "
                f"(1 dev: {f1:.0f}, {max(report['mesh_sizes'])} dev: {f8:.0f})"
            )
    return problems


def main() -> int:
    # pin the CPU platform BEFORE any backend initialization: the TPU-tunnel
    # plugin ignores the JAX_PLATFORMS env var for the default backend, and
    # this proxy must work (and be cheap) with no TPU attached
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    report = build_report()
    problems = check_report(report)
    report["ok"] = not problems
    report["problems"] = problems
    out = os.path.join(ROOT, "SCALING_PROXY.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"ok": report["ok"], "problems": problems}))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
