"""Third-party MujocoEnv subclass with a user-supplied MJCF file.

Mirrors the reference's third-party contract
(tests/envs/mujoco/test_mujoco_custom_env.py): subclass ``MujocoEnv``, point
it at an ``.xml``, override ``_get_obs``/``reset_model``/``_get_reset_info``.
The model compiles on the fly through gymnasium_tpu.envs.mujoco.mjcf.
"""

import numpy as np
import pytest

from gymnasium_tpu import spaces, utils
from gymnasium_tpu.envs.mujoco.mujoco_env import MujocoEnv

CART_XML = """
<mujoco model="minicart">
  <option timestep="0.01"/>
  <worldbody>
    <geom name="floor" type="plane" pos="0 0 0" size="10 10 1" condim="3"/>
    <body name="cart" pos="0 0 0.2">
      <joint name="slide_x" type="slide" axis="1 0 0" damping="0.5"/>
      <geom name="box" type="box" size="0.2 0.1 0.1" density="500"/>
    </body>
  </worldbody>
  <actuator>
    <motor joint="slide_x" gear="10" ctrllimited="true" ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""


class MiniCartEnv(MujocoEnv, utils.EzPickle):
    def __init__(self, xml_file, frame_skip=2, **kwargs):
        utils.EzPickle.__init__(self, xml_file, frame_skip, **kwargs)
        MujocoEnv.__init__(
            self, xml_file, frame_skip=frame_skip, observation_space=None, **kwargs
        )
        size = self.data.qpos.size + self.data.qvel.size
        self.observation_space = spaces.Box(-np.inf, np.inf, (size,), np.float64)

    def _get_obs(self):
        return np.concatenate([self.data.qpos.flat.copy(), self.data.qvel.flat.copy()])

    def step(self, action):
        before = self.data.qpos[0]
        self.do_simulation(action, self.frame_skip)
        reward = float(self.data.qpos[0] - before)
        return self._get_obs(), reward, False, False, {}

    def _get_reset_info(self):
        return {"custom": True}


@pytest.fixture(scope="module")
def xml_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("mjcf") / "minicart.xml"
    path.write_text(CART_XML)
    return str(path)


def test_custom_xml_env_steps(xml_path):
    env = MiniCartEnv(xml_path)
    obs, info = env.reset(seed=0)
    assert info == {"custom": True}
    assert obs.shape == (2,) and obs.dtype == np.float64
    for _ in range(20):
        obs, reward, term, trunc, _ = env.step(np.array([1.0], np.float32))
    assert obs[0] > 0.01, "constant push must move the cart forward"
    assert obs.dtype == np.float64
    env.close()


def test_custom_env_checker_and_pickle(xml_path):
    import pickle

    from gymnasium_tpu.utils.env_checker import check_env

    env = MiniCartEnv(xml_path)
    check_env(env, skip_render_check=True)
    clone = pickle.loads(pickle.dumps(env))
    clone.reset(seed=3)
    clone.step(clone.action_space.sample())
    clone.close()
    env.close()


def test_missing_xml_raises():
    with pytest.raises(OSError, match="does not exist"):
        MiniCartEnv("no_such_model.xml")
