"""Pytest plugin: alias ``gymnasium`` (and every submodule) to ``gymnasium_tpu``.

Used by tests/reference_suite to run the REFERENCE's own test files, unmodified
and in place (/root/reference/tests), against this package — the strongest
possible behavioral-parity check (the adversary's tests, our implementation).

A meta-path finder intercepts any ``gymnasium[.X.Y]`` import and returns the
ALREADY-IMPORTED ``gymnasium_tpu[.X.Y]`` module object (same identity, so
isinstance checks across the alias boundary hold). Meta-path finders run
before path-based finders, so the real reference package never loads even
with /root/reference on sys.path.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.util
import sys


class _AliasLoader(importlib.abc.Loader):
    def __init__(self, module):
        self._module = module

    def create_module(self, spec):
        return self._module

    def exec_module(self, module):
        pass


class _GymAliasFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, name, path=None, target=None):
        if name != "gymnasium" and not name.startswith("gymnasium."):
            return None
        real_name = name.replace("gymnasium", "gymnasium_tpu", 1)
        try:
            module = importlib.import_module(real_name)
        except ImportError:
            return None
        spec = importlib.util.spec_from_loader(name, _AliasLoader(module))
        # submodule imports resolve through the aliased parent's __path__
        if hasattr(module, "__path__"):
            spec.submodule_search_locations = list(module.__path__)
        return spec


sys.meta_path.insert(0, _GymAliasFinder())


def _alias_registry_entry_points() -> None:
    """Rewrite registry entry-point strings to the ``gymnasium.`` alias.

    The reference's all-envs collector (tests/envs/utils.py:14) selects specs
    whose entry_point contains the literal ``"gymnasium.envs."``. Under the
    alias those module paths import to the same gymnasium_tpu modules, so the
    rewrite is a pure rename — every spec stays constructible — while letting
    the adversary's conformance sweep see the full registry.
    """
    import gymnasium_tpu as gym

    def alias(ep):
        if isinstance(ep, str) and ep.startswith("gymnasium_tpu."):
            return ep.replace("gymnasium_tpu.", "gymnasium.", 1)
        return ep

    for spec in gym.envs.registry.values():
        spec.entry_point = alias(spec.entry_point)
        if getattr(spec, "vector_entry_point", None) is not None:
            spec.vector_entry_point = alias(spec.vector_entry_point)
        if getattr(spec, "jax_entry_point", None) is not None:
            spec.jax_entry_point = alias(spec.jax_entry_point)


_alias_registry_entry_points()


def _adapt_mujoco_kinematics() -> None:
    """Let ``mujoco.mj_kinematics``/``mj_forward`` accept this package's
    model/data shims.

    The reference's tests call ``mujoco.mj_kinematics(env.model, env.data)``
    before reading ``data.qpos``/``data.body(...).xpos``
    (test_mujoco_v5.py:367,419). On real MuJoCo structs that refreshes the
    CACHED forward-kinematics arrays from qpos; this package's shims are
    LIVE views that recompute from qpos on every access, so the refresh is
    a no-op by construction — the adapter makes that explicit instead of
    letting the C binding reject the foreign types. Real MjModel/MjData
    arguments still go to the C implementation untouched.
    """
    try:
        import mujoco
    except ImportError:
        return

    from gymnasium_tpu.envs.mujoco.mujoco_env import _MjDataShim
    from gymnasium_tpu.physics.articulated import ArticulatedModel

    def wrap(fn):
        def adapted(model, data, *args, **kwargs):
            if isinstance(model, ArticulatedModel) or isinstance(data, _MjDataShim):
                return None  # live-view shims are always FK-consistent
            return fn(model, data, *args, **kwargs)

        return adapted

    for name in ("mj_kinematics", "mj_forward"):
        setattr(mujoco, name, wrap(getattr(mujoco, name)))


_adapt_mujoco_kinematics()
