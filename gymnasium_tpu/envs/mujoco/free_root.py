"""Helpers for free-root robots (Ant/Humanoid): Euler root ↔ quaternion obs.

The engine parametrizes the floating base as 3 world slides + XYZ Euler
hinges; MuJoCo observations expose a quaternion, so these helpers convert
for observation parity (SURVEY.md §7 stage 9 note on free joints).
"""

from __future__ import annotations

import numpy as np

__all__ = ["euler_to_quat", "euler_rates_to_omega"]


def euler_to_quat(xp, euler):
    """XYZ-intrinsic Euler angles to a (w, x, y, z) quaternion."""
    rx, ry, rz = euler[..., 0], euler[..., 1], euler[..., 2]
    cx, sx = xp.cos(rx / 2), xp.sin(rx / 2)
    cy, sy = xp.cos(ry / 2), xp.sin(ry / 2)
    cz, sz = xp.cos(rz / 2), xp.sin(rz / 2)
    # q = qx ⊗ qy ⊗ qz
    w = cx * cy * cz - sx * sy * sz
    x = sx * cy * cz + cx * sy * sz
    y = cx * sy * cz - sx * cy * sz
    z = cx * cy * sz + sx * sy * cz
    return xp.stack([w, x, y, z], axis=-1)


def euler_rates_to_omega(xp, euler, rates):
    """World angular velocity from XYZ Euler angles + their rates.

    ω = ė_x·x̂ + ė_y·(R_x ŷ) + ė_z·(R_x R_y ẑ).
    """
    rx, ry = euler[..., 0], euler[..., 1]
    dx, dy, dz = rates[..., 0], rates[..., 1], rates[..., 2]
    cx, sx = xp.cos(rx), xp.sin(rx)
    cy, sy = xp.cos(ry), xp.sin(ry)
    wx = dx + dz * sy
    wy = dy * cx - dz * sx * cy
    wz = dy * sx + dz * cx * cy
    return xp.stack([wx, wy, wz], axis=-1)
