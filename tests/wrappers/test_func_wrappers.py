"""Functional (device-side) wrappers vs their host twins.

Each test records one autoresetting device trajectory (phys2d CartPole under
``JaxVectorEnv``), then drives BOTH the functional wrapper (pure
state-threading over the recorded timesteps) and the host twin (replaying the
identical underlying transitions through a fake env) and asserts the outputs
match step-for-step. This pins the functional wrappers to the reference
semantics the host catalog already reproduces (reference
stateful_observation.py:458, stateful_reward.py:19, stateful_observation.py:298,
wrappers/vector/common.py:22).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gymnasium_tpu as gym
from gymnasium_tpu.envs.phys2d.cartpole import CartPoleFunctional
from gymnasium_tpu.functional import EnvCarry
from gymnasium_tpu.vector.jax_vector_env import JaxVectorEnv
from gymnasium_tpu.vector.vector_env import VectorEnv
from gymnasium_tpu.wrappers import func as fw
from gymnasium_tpu.wrappers import vector as host_vec

NUM_ENVS = 8
NUM_STEPS = 120  # long enough for many episode boundaries at time_limit=25


@pytest.fixture(scope="module")
def trajectory():
    """An unwrapped device trajectory with NEXT_STEP autoreset boundaries.

    Returns arrays (time-major): obs (T+1 incl. reset obs at t=0), reward,
    terminated, truncated, reset_mask (lane was autoreset THIS step), and the
    post-step ``steps`` counters.
    """
    env = JaxVectorEnv(
        CartPoleFunctional(), num_envs=NUM_ENVS, max_episode_steps=25, seed=7
    )
    obs0, _ = env.reset(seed=7)

    obs, rewards, terms, truncs, resets, steps = [], [], [], [], [], []
    rng = jax.random.PRNGKey(123)
    for _ in range(NUM_STEPS):
        rng, k = jax.random.split(rng)
        reset_mask = np.asarray(env.carry.prev_done)
        actions = jax.random.randint(k, (NUM_ENVS,), 0, 2)
        o, r, te, tr, _ = env.step(actions)
        obs.append(np.asarray(o))
        rewards.append(np.asarray(r))
        terms.append(np.asarray(te))
        truncs.append(np.asarray(tr))
        resets.append(reset_mask)
        steps.append(np.asarray(env.carry.steps))
    return {
        "obs0": np.asarray(obs0),
        "obs": np.stack(obs),
        "reward": np.stack(rewards),
        "terminated": np.stack(terms),
        "truncated": np.stack(truncs),
        "reset_mask": np.stack(resets),
        "steps": np.stack(steps),
    }


def run_functional(wrapper, traj, with_carry_steps=False):
    """Thread one functional wrapper over the recorded trajectory."""
    n = traj["obs0"].shape[0]
    carry0 = EnvCarry(
        state=None,
        rng=jax.random.PRNGKey(0),
        steps=jnp.zeros((n,), jnp.int32),
        prev_done=jnp.zeros((n,), bool),
    )
    wstate, obs0 = wrapper.init(jax.random.PRNGKey(1), jnp.asarray(traj["obs0"]), carry0)

    outs = []
    for t in range(traj["obs"].shape[0]):
        ts = gym.functional.TimeStep(
            obs=jnp.asarray(traj["obs"][t]),
            reward=jnp.asarray(traj["reward"][t]),
            terminated=jnp.asarray(traj["terminated"][t]),
            truncated=jnp.asarray(traj["truncated"][t]),
            info={},
        )
        carry = EnvCarry(
            state=None,
            rng=jax.random.PRNGKey(0),
            steps=jnp.asarray(traj["steps"][t]),
            prev_done=jnp.zeros((n,), bool),
        )
        wstate, ts = wrapper.update(
            wstate, ts, jnp.asarray(traj["reset_mask"][t]), carry
        )
        outs.append(ts)
    return obs0, outs, wstate


class ReplayVectorEnv(VectorEnv):
    """Fake vector env replaying a recorded autoreset trajectory."""

    def __init__(self, traj):
        self.traj = traj
        self.num_envs = traj["obs0"].shape[0]
        self.t = 0
        obs_dim = traj["obs0"].shape[1]
        self.single_observation_space = gym.spaces.Box(-np.inf, np.inf, (obs_dim,))
        self.single_action_space = gym.spaces.Discrete(2)
        from gymnasium_tpu.vector.utils import batch_space

        self.observation_space = batch_space(self.single_observation_space, self.num_envs)
        self.action_space = batch_space(self.single_action_space, self.num_envs)

    def reset(self, *, seed=None, options=None):
        self.t = 0
        return self.traj["obs0"].copy(), {}

    def step(self, actions):
        t = self.t
        self.t += 1
        return (
            self.traj["obs"][t].copy(),
            self.traj["reward"][t].copy(),
            self.traj["terminated"][t].copy(),
            self.traj["truncated"][t].copy(),
            {},
        )


# ---------------------------------------------------------------------------


def test_normalize_observation_matches_host(trajectory):
    wrapper = fw.NormalizeObservation(dtype=jnp.float64)
    obs0_f, outs, wstate = run_functional(wrapper, trajectory)

    host = host_vec.NormalizeObservation(ReplayVectorEnv(trajectory))
    obs0_h, _ = host.reset()
    np.testing.assert_allclose(np.asarray(obs0_f), obs0_h, rtol=1e-5, atol=1e-6)
    for t, ts in enumerate(outs):
        o_h, *_ = host.step(None)
        np.testing.assert_allclose(
            np.asarray(ts.obs), o_h, rtol=1e-4, atol=1e-5, err_msg=f"step {t}"
        )
    np.testing.assert_allclose(np.asarray(wstate.mean), host.obs_rms.mean, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(wstate.var), host.obs_rms.var, rtol=1e-3)


def test_normalize_observation_freeze(trajectory):
    wrapper = fw.NormalizeObservation()
    carry0 = EnvCarry(None, jax.random.PRNGKey(0), jnp.zeros(8, jnp.int32), jnp.zeros(8, bool))
    wstate, _ = wrapper.init(jax.random.PRNGKey(1), jnp.asarray(trajectory["obs0"]), carry0)
    frozen = fw.NormalizeObservation.freeze(wstate)
    ts = gym.functional.TimeStep(
        jnp.asarray(trajectory["obs"][0]),
        jnp.asarray(trajectory["reward"][0]),
        jnp.asarray(trajectory["terminated"][0]),
        jnp.asarray(trajectory["truncated"][0]),
        {},
    )
    new_state, _ = wrapper.update(frozen, ts, jnp.zeros(8, bool), carry0)
    np.testing.assert_array_equal(np.asarray(new_state.mean), np.asarray(frozen.mean))
    np.testing.assert_array_equal(np.asarray(new_state.count), np.asarray(frozen.count))


def test_normalize_reward_matches_host(trajectory):
    wrapper = fw.NormalizeReward(gamma=0.99)
    _, outs, wstate = run_functional(wrapper, trajectory)

    host = host_vec.NormalizeReward(ReplayVectorEnv(trajectory), gamma=0.99)
    host.reset()
    for t, ts in enumerate(outs):
        _, r_h, *_ = host.step(None)
        np.testing.assert_allclose(
            np.asarray(ts.reward), r_h, rtol=1e-4, atol=1e-6, err_msg=f"step {t}"
        )
    np.testing.assert_allclose(
        np.asarray(wstate.accumulated), host.accumulated_reward, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(float(wstate.rms.var), float(host.return_rms.var), rtol=1e-3)


def _episode_slices(traj, lane):
    """Split one lane of the autoreset trajectory into host-style episodes:
    yields lists of step indices; a reset step starts a new episode."""
    episodes, current = [], []
    for t in range(traj["obs"].shape[0]):
        if traj["reset_mask"][t, lane]:
            episodes.append(current)
            current = []
        current.append(t)
    episodes.append(current)
    return episodes


class _ReplayLaneEnv(gym.Env):
    """Single-env replay of one lane of one recorded episode."""

    def __init__(self, traj, lane):
        self.traj, self.lane = traj, lane
        obs_dim = traj["obs0"].shape[1]
        self.observation_space = gym.spaces.Box(-np.inf, np.inf, (obs_dim,))
        self.action_space = gym.spaces.Discrete(2)
        self.schedule: list[int] = []
        self.reset_obs: np.ndarray = traj["obs0"][lane]
        self.i = 0

    def reset(self, *, seed=None, options=None):
        self.i = 0
        return self.reset_obs.copy(), {}

    def step(self, action):
        t = self.schedule[self.i]
        self.i += 1
        return (
            self.traj["obs"][t, self.lane].copy(),
            float(self.traj["reward"][t, self.lane]),
            bool(self.traj["terminated"][t, self.lane]),
            bool(self.traj["truncated"][t, self.lane]),
            {},
        )


@pytest.mark.parametrize("padding_type", ["reset", "zero"])
def test_frame_stack_matches_host(trajectory, padding_type):
    from gymnasium_tpu.wrappers import FrameStackObservation as HostFrameStack

    wrapper = fw.FrameStackObservation(4, padding_type=padding_type)
    obs0_f, outs, _ = run_functional(wrapper, trajectory)

    for lane in (0, 3):
        replay = _ReplayLaneEnv(trajectory, lane)
        host = HostFrameStack(replay, stack_size=4, padding_type=padding_type)
        episodes = _episode_slices(trajectory, lane)
        for ep_idx, ep in enumerate(episodes):
            if ep_idx == 0:
                replay.reset_obs = trajectory["obs0"][lane]
                expected0 = np.asarray(obs0_f)[lane]
                steps = ep
            else:
                # episode starts at the reset step: its obs is the reset obs
                t0 = ep[0]
                replay.reset_obs = trajectory["obs"][t0, lane]
                expected0 = np.asarray(outs[t0].obs)[lane]
                steps = ep[1:]
            replay.schedule = steps
            o_h, _ = host.reset()
            np.testing.assert_allclose(expected0, o_h, rtol=1e-6)
            for t in steps:
                o_h, *_ = host.step(0)
                np.testing.assert_allclose(
                    np.asarray(outs[t].obs)[lane], o_h, rtol=1e-6,
                    err_msg=f"lane {lane} step {t}",
                )


def test_time_aware_matches_host(trajectory):
    from gymnasium_tpu.wrappers import TimeAwareObservation as HostTimeAware

    wrapper = fw.TimeAwareObservation()
    obs0_f, outs, _ = run_functional(wrapper, trajectory)

    lane = 1
    replay = _ReplayLaneEnv(trajectory, lane)
    # host wrapper requires a TimeLimit bound via spec or wrapper chain
    replay.spec = gym.envs.registration.EnvSpec(
        id="Replay-v0", entry_point="none:None", max_episode_steps=25
    )
    host = HostTimeAware(replay)
    episodes = _episode_slices(trajectory, lane)
    for ep_idx, ep in enumerate(episodes):
        if ep_idx == 0:
            replay.reset_obs = trajectory["obs0"][lane]
            expected0 = np.asarray(obs0_f)[lane]
            steps = ep
        else:
            t0 = ep[0]
            replay.reset_obs = trajectory["obs"][t0, lane]
            expected0 = np.asarray(outs[t0].obs)[lane]
            steps = ep[1:]
        replay.schedule = steps
        o_h, _ = host.reset()
        np.testing.assert_allclose(expected0, o_h, rtol=1e-6)
        for t in steps:
            o_h, *_ = host.step(0)
            np.testing.assert_allclose(
                np.asarray(outs[t].obs)[lane], o_h, rtol=1e-6, err_msg=f"step {t}"
            )


def test_episode_statistics_matches_host(trajectory):
    wrapper = fw.EpisodeStatistics()
    _, outs, _ = run_functional(wrapper, trajectory)

    host = host_vec.RecordEpisodeStatistics(ReplayVectorEnv(trajectory))
    host.reset()
    for t, ts in enumerate(outs):
        *_, infos = host.step(None)
        conv = fw.episode_stats_to_infos(
            {k: np.asarray(v) for k, v in ts.info.items()}
        )
        if "episode" in infos:
            assert "episode" in conv, f"step {t}: device missed an episode end"
            np.testing.assert_array_equal(conv["_episode"], infos["_episode"])
            np.testing.assert_allclose(
                conv["episode"]["r"], infos["episode"]["r"], rtol=1e-5
            )
            np.testing.assert_array_equal(conv["episode"]["l"], infos["episode"]["l"])
        else:
            assert "episode" not in conv, f"step {t}: spurious episode end"


def test_transform_clip_rescale():
    """Stateless transforms behave like their host formulas."""
    a = jnp.asarray([[-2.0, 0.5, 3.0]])
    _, clipped = fw.ClipAction(-1.0, 1.0).transform_action(None, a)
    np.testing.assert_allclose(np.asarray(clipped), [[-1.0, 0.5, 1.0]])

    _, rescaled = fw.RescaleAction(jnp.zeros(3), jnp.ones(3)).transform_action(
        None, jnp.asarray([[-1.0, 0.0, 1.0]])
    )
    np.testing.assert_allclose(np.asarray(rescaled), [[0.0, 0.5, 1.0]], atol=1e-6)

    ts = gym.functional.TimeStep(
        jnp.asarray([[0.0, 5.0]]), jnp.asarray([3.0]), jnp.asarray([False]),
        jnp.asarray([False]), {},
    )
    _, ts2 = fw.ClipReward(-1.0, 1.0).update(None, ts, jnp.zeros(1, bool), None)
    np.testing.assert_allclose(np.asarray(ts2.reward), [1.0])

    _, ts3 = fw.TransformObservation(lambda o: o * 2).update(
        None, ts, jnp.zeros(1, bool), None
    )
    np.testing.assert_allclose(np.asarray(ts3.obs), [[0.0, 10.0]])

    _, ts4 = fw.RescaleObservation(jnp.zeros(2), 10.0 * jnp.ones(2)).update(
        None, ts, jnp.zeros(1, bool), None
    )
    np.testing.assert_allclose(np.asarray(ts4.obs), [[-1.0, 0.0]], atol=1e-6)


def test_wrapped_jax_vector_env_runs_jitted(trajectory):
    """The full stack (normalize obs+reward, episode stats) inside ONE jitted
    step and a scan rollout — the flagship-path requirement."""
    env = JaxVectorEnv(
        CartPoleFunctional(),
        num_envs=16,
        max_episode_steps=50,
        seed=3,
        wrappers=[
            fw.NormalizeObservation(),
            fw.NormalizeReward(),
            fw.EpisodeStatistics(),
        ],
    )
    obs, _ = env.reset(seed=3)
    assert obs.shape == (16, 4)
    o, r, te, tr, info = env.step(jnp.zeros(16, jnp.int32))
    assert o.shape == (16, 4) and "_episode" in info

    carry, traj = env.rollout(64)
    assert traj.obs.shape == (64, 16, 4)
    assert traj.info["_episode"].shape == (64, 16)
    # some episodes must have finished inside the rollout, with sane stats
    ended = np.asarray(traj.info["_episode"])
    assert ended.any()
    lens = np.asarray(traj.info["episode_length"])[ended]
    assert (lens > 0).all() and (lens <= 50).all()
    # normalized observations should be roughly standardized by rollout end
    tail = np.asarray(traj.obs[-16:])
    assert np.abs(tail.mean()) < 1.0 and 0.05 < tail.std() < 5.0


def test_wrapped_env_spaces():
    env_fs = JaxVectorEnv(
        CartPoleFunctional(), num_envs=4, max_episode_steps=10,
        wrappers=[fw.FrameStackObservation(3)],
    )
    assert env_fs.single_observation_space.shape == (3, 4)
    obs, _ = env_fs.reset(seed=0)
    assert obs.shape == (4, 3, 4)
    o, *_ = env_fs.step(jnp.zeros(4, jnp.int32))
    assert o.shape == (4, 3, 4)

    env_ta = JaxVectorEnv(
        CartPoleFunctional(), num_envs=4, max_episode_steps=10,
        wrappers=[fw.TimeAwareObservation()],
    )
    assert env_ta.single_observation_space.shape == (5,)
    obs, _ = env_ta.reset(seed=0)
    assert obs.shape == (4, 5)
    assert np.all(np.asarray(obs)[:, -1] == 0)
    o, *_ = env_ta.step(jnp.zeros(4, jnp.int32))
    assert np.all(np.asarray(o)[:, -1] == 1)


def test_delay_observation_matches_host(trajectory):
    from gymnasium_tpu.wrappers import DelayObservation as HostDelay

    wrapper = fw.DelayObservation(2)
    obs0_f, outs, _ = run_functional(wrapper, trajectory)

    lane = 2
    replay = _ReplayLaneEnv(trajectory, lane)
    host = HostDelay(replay, delay=2)
    episodes = _episode_slices(trajectory, lane)
    for ep_idx, ep in enumerate(episodes):
        if ep_idx == 0:
            replay.reset_obs = trajectory["obs0"][lane]
            expected0 = np.asarray(obs0_f)[lane]
            steps = ep
        else:
            t0 = ep[0]
            replay.reset_obs = trajectory["obs"][t0, lane]
            expected0 = np.asarray(outs[t0].obs)[lane]
            steps = ep[1:]
        replay.schedule = steps
        o_h, _ = host.reset()
        np.testing.assert_allclose(expected0, o_h, rtol=1e-6)
        for t in steps:
            o_h, *_ = host.step(0)
            np.testing.assert_allclose(
                np.asarray(outs[t].obs)[lane], o_h, rtol=1e-6, err_msg=f"step {t}"
            )


def test_sticky_action_repeats_with_probability():
    import gymnasium_tpu as gym

    n = 512
    space = gym.spaces.Box(-1.0, 1.0, (2,), np.float32)
    wrapper = fw.StickyAction(0.5, action_space=space)
    carry = EnvCarry(None, jax.random.PRNGKey(0), jnp.zeros(n, jnp.int32), jnp.zeros(n, bool))
    wstate, _ = wrapper.init(jax.random.PRNGKey(1), jnp.zeros((n, 4)), carry)

    # first step after init: never repeats (is_first)
    a1 = jnp.ones((n, 2))
    wstate, out1 = wrapper.transform_action(wstate, a1)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(a1))
    ts = gym.functional.TimeStep(
        jnp.zeros((n, 4)), jnp.zeros(n), jnp.zeros(n, bool), jnp.zeros(n, bool), {}
    )
    wstate, _ = wrapper.update(wstate, ts, jnp.zeros(n, bool), carry)

    # second step: a distinct action should be replaced by the previous one
    # on roughly p of the lanes
    a2 = jnp.full((n, 2), 5.0)
    wstate, out2 = wrapper.transform_action(wstate, a2)
    repeated = np.asarray(out2[:, 0] == 1.0)
    assert 0.35 < repeated.mean() < 0.65, repeated.mean()

    # after a reset step, the next action always passes through
    wstate, _ = wrapper.update(wstate, ts, jnp.ones(n, bool), carry)
    a3 = jnp.full((n, 2), -3.0)
    wstate, out3 = wrapper.transform_action(wstate, a3)
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(a3))


def test_sticky_action_inside_jax_vector_env():
    env = JaxVectorEnv(
        CartPoleFunctional(),
        num_envs=8,
        max_episode_steps=50,
        seed=0,
        wrappers=[fw.StickyAction(0.25), fw.DelayObservation(1)],
    )
    env.reset(seed=0)
    for _ in range(5):
        o, *_ = env.step(jnp.zeros(8, jnp.int32))
    assert o.shape == (8, 4)
    carry, traj = env.rollout(20)
    assert traj.obs.shape == (20, 8, 4)
