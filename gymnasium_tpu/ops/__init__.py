"""Pallas TPU kernels for hot paths.

The generic device path is XLA (`jit(lax.scan(step))`); kernels here exist
where a fused Pallas program measurably beats XLA fusion — see each module's
docstring for the measured numbers and the roofline argument.
"""

from gymnasium_tpu.ops.pallas_rollout import cartpole_rollout_fused

__all__ = ["cartpole_rollout_fused"]
