"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates SURVEY.md §7 stage 7: env-state pytrees sharded over a mesh, the
same compiled step running SPMD, and the sharded PPO train step."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional
from gymnasium_tpu.parallel import make_mesh, shard_env_batch
from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_mesh_construction():
    mesh = make_mesh(tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh = make_mesh()
    assert mesh.shape == {"dp": 8, "tp": 1}


def test_sharded_env_batch_rollout():
    mesh = make_mesh()
    sharding = NamedSharding(mesh, P("dp"))
    env = JaxVectorEnv(
        CartPoleFunctional(), num_envs=64, max_episode_steps=100, seed=0, sharding=sharding
    )
    env.reset()
    # carry leaves with leading env axis must actually be dp-sharded
    state_sharding = env.carry.state.sharding
    assert not state_sharding.is_fully_replicated

    carry, traj = env.rollout(100, unroll=1)
    reward = np.asarray(traj.reward)
    assert reward.shape == (100, 64)
    assert np.isfinite(reward).all()

    # identical seed without sharding gives the same trajectory
    env2 = JaxVectorEnv(CartPoleFunctional(), num_envs=64, max_episode_steps=100, seed=0)
    env2.reset()
    _, traj2 = env2.rollout(100, unroll=1)
    np.testing.assert_allclose(reward, np.asarray(traj2.reward), rtol=1e-6)


def test_shard_env_batch_replicates_scalars():
    mesh = make_mesh()
    tree = {
        "state": jnp.zeros((64, 4)),
        "rng": jax.random.PRNGKey(0),
        "steps": jnp.zeros(64, dtype=jnp.int32),
    }
    placed = shard_env_batch(tree, mesh, batch_size=64)
    assert not placed["state"].sharding.is_fully_replicated
    assert placed["rng"].sharding.is_fully_replicated


def test_sharded_ppo_train_step():
    from gymnasium_tpu.parallel import shard_ppo_state
    from gymnasium_tpu.train.ppo import PPOConfig, init_ppo, make_train_step

    mesh = make_mesh()
    config = PPOConfig(
        num_envs=32,
        rollout_steps=4,
        hidden_sizes=(16, 16),
        num_minibatches=2,
        update_epochs=1,
        max_episode_steps=16,
    )
    state, env_params, tx = init_ppo(CartPoleFunctional(), config, jax.random.PRNGKey(0))
    state = shard_ppo_state(state, mesh)
    train_step = jax.jit(make_train_step(CartPoleFunctional(), config, env_params, tx))
    state, metrics = train_step(state)
    jax.block_until_ready(state)
    assert float(metrics["reward_per_step"]) > 0.0
    assert np.isfinite(float(metrics["loss"]))


def test_gather_trajectory_replicates():
    import jax
    import numpy as np

    from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional
    from gymnasium_tpu.parallel import gather_trajectory, make_mesh, shard_env_batch
    from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv

    mesh = make_mesh(jax.devices("cpu"))
    env = JaxVectorEnv(CartPoleFunctional(), num_envs=64, max_episode_steps=100, seed=0)
    env.reset()
    env.carry = shard_env_batch(env.carry, mesh)
    carry, traj = env.rollout(16)
    # dp-sharded along the env axis before, fully replicated after
    assert "dp" in str(traj.obs.sharding.spec)
    gathered = gather_trajectory(traj, mesh)
    assert gathered.obs.sharding.is_fully_replicated
    assert np.asarray(gathered.obs).shape == (16, 64, 4)


def test_per_device_work_invariance():
    """Scaling-efficiency proxy on virtual devices (wall-clock there is
    meaningless): with the TOTAL env batch scaled proportionally to the mesh
    size, each device's addressable shard of the carry stays EXACTLY the
    same shape — so on real hardware per-device work is constant and the
    step contains no collectives that grow with the mesh. Real-chip
    efficiency then reduces to ICI latency, measured by
    parallel.scaling_report when multi-chip hardware exists."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    per_device_envs = 16
    shard_shapes = {}
    for n_dev in (2, 4, 8):
        devices = jax.devices()[:n_dev]
        mesh = make_mesh(devices)
        env = JaxVectorEnv(
            CartPoleFunctional(),
            num_envs=per_device_envs * n_dev,
            max_episode_steps=50,
            seed=0,
            sharding=NamedSharding(mesh, P("dp")),
        )
        env.reset()
        env.step(jnp.zeros(per_device_envs * n_dev, jnp.int32))
        shards = env.carry.state.addressable_shards
        assert len(shards) == n_dev
        shapes = {s.data.shape for s in shards}
        assert len(shapes) == 1, f"uneven shards at {n_dev} devices: {shapes}"
        shard_shapes[n_dev] = shapes.pop()
    assert len(set(shard_shapes.values())) == 1, (
        f"per-device work varies with mesh size: {shard_shapes}"
    )


def test_scaling_proxy_collective_invariance():
    """Compile-time scaling proxy (VERDICT r2 #9): the dp-sharded env step
    lowers to ZERO collectives at any mesh size, and the PPO train step's
    collective count is constant while per-device FLOPs shrink with the
    mesh. tools/scaling_proxy.py emits the full SCALING_PROXY.json artifact;
    this test pins the invariants on a small/large pair."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import scaling_proxy

    cpu = jax.devices()
    env_1 = scaling_proxy.analyze_env_step(cpu[:1], 64)
    env_8 = scaling_proxy.analyze_env_step(cpu[:8], 64)
    assert sum(env_1["collectives"].values()) == 0
    assert sum(env_8["collectives"].values()) == 0
    assert env_8["flops_per_device"] <= 0.3 * env_1["flops_per_device"]

    ppo_2 = scaling_proxy.analyze_ppo_step(cpu[:2], 64)
    ppo_8 = scaling_proxy.analyze_ppo_step(cpu[:8], 64)
    assert sum(ppo_2["collectives"].values()) == sum(ppo_8["collectives"].values())
    assert ppo_8["flops_per_device"] < 0.5 * ppo_2["flops_per_device"]


def test_two_level_mesh_collectives_by_axis():
    """Two-level Mesh(("hosts","chips")) proxy (VERDICT r3 #6 / r4 #6):
    the env batch shards over BOTH axes with zero env-step collectives on
    either; the PPO learner's all-reduces span both axes (hierarchical
    ICI-then-DCN reduction); trajectory egress to the replicated learner is
    an all-gather. tools/scaling_proxy.py writes the full artifact; this
    pins the invariants on the 2x4 factorization."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import scaling_proxy

    cpu = jax.devices()
    assert len(cpu) >= 8
    entry = scaling_proxy.analyze_two_level(cpu[:8], hosts=2, num_envs_total=64)

    env_axes = entry["env_step"]["by_axis"]
    assert sum(entry["env_step"]["collectives"].values()) == 0
    assert env_axes["hosts"] == 0 and env_axes["chips"] == 0 and env_axes["both"] == 0

    ppo_axes = entry["ppo_train_step"]["by_axis"]
    assert ppo_axes["both"] >= 1, f"learner all-reduce must span both axes: {ppo_axes}"

    egress = entry["trajectory_egress"]
    assert egress["collectives"]["all-gather"] >= 1
    assert egress["by_axis"]["both"] >= 1
