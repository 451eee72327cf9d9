"""Utility subpackage (parity: reference gymnasium/utils/__init__.py)."""

from gymnasium_tpu.utils.colorize import colorize
from gymnasium_tpu.utils.ezpickle import EzPickle
from gymnasium_tpu.utils.record_constructor import RecordConstructorArgs
from gymnasium_tpu.utils import seeding

__all__ = [
    "EzPickle",
    "RecordConstructorArgs",
    "colorize",
    "seeding",
]


def __getattr__(name):
    # Heavier utilities (checkers, play, video) import lazily.
    import importlib

    lazy = {
        "check_env": "env_checker",
        "check_environments_match": "env_match",
        "data_equivalence": "data_equivalence",
        "play": "play",
        "PlayPlot": "play",
        "PlayableGame": "play",
        "save_video": "save_video",
        "capped_cubic_video_schedule": "save_video",
        "benchmark_step": "performance",
        "benchmark_init": "performance",
        "benchmark_render": "performance",
        "benchmark_compiled_rollout": "performance",
        "step_api_compatibility": "step_api_compatibility",
        "convert_to_terminated_truncated_step_api": "step_api_compatibility",
        "convert_to_done_step_api": "step_api_compatibility",
    }
    if name in lazy:
        module = importlib.import_module(f"gymnasium_tpu.utils.{lazy[name]}")
        return getattr(module, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
