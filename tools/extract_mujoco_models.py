"""Compile the reference MJCF robot assets into committed spec tables.

Run once during development: reads MuJoCo XML models (standard published
robot descriptions) and writes ``gymnasium_tpu/envs/mujoco/models/*.npz``
containing the ArticulatedModel arrays. The envs load these at runtime; the
XML compiler (gymnasium_tpu/envs/mujoco/mjcf.py) remains available for
user-supplied models.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gymnasium_tpu.envs.mujoco.mjcf import compile_mjcf

ASSETS = os.environ.get(
    "MJCF_ASSET_DIR", "/root/reference/gymnasium/envs/mujoco/assets"
)
OUT = os.path.join(os.path.dirname(__file__), "..", "gymnasium_tpu", "envs", "mujoco", "models")

MODELS = [
    "half_cheetah",
    "hopper",
    "walker2d",
    "walker2d_v5",
    "swimmer",
    "ant",
    "humanoid",
    "humanoidstandup",
    "inverted_pendulum",
    "inverted_double_pendulum",
    "reacher",
    "pusher",
    "pusher_v5",
]

# Per-model default contact-spring ceiling (N/m). The reference XMLs carry no
# per-geom solref, so contact softness is calibrated per model against the
# parity gates (tests/envs/test_mujoco_parity.py): 100000 keeps the standing
# HUMANOID's feet from sinking through the healthy-z floor under fall
# transients, while the supine HUMANOIDSTANDUP needs MuJoCo's soft-contact
# regime (stiff springs kick the resting torso off the floor: zero-action
# deviation 1.59 vs 0.195 at 10000).
CONTACT_STIFFNESS = {
    "humanoidstandup": 10000.0,
}
DEFAULT_CONTACT_STIFFNESS = 100000.0

# Per-model contact radius lift (m): shifts the force-onset surface outward
# the way MuJoCo's includemargin does, so a soft spring can carry its static
# load without sitting measurably below the real engine. humanoidstandup's
# reward integrates torso HEIGHT (uph_cost), so the supine body's ~8.8 mm of
# penalty-spring penetration (measured vs live MuJoCo: ref z 0.0873 vs ours
# 0.0785 after 100 zero-action settle steps) showed up directly as a -10%
# return bias at the n=64 distribution gate.
CONTACT_LIFT = {
    "humanoidstandup": 0.0085,
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name in MODELS:
        path = os.path.join(ASSETS, f"{name}.xml")
        if not os.path.exists(path):
            print(f"skip {name}: no asset")
            continue
        model, meta = compile_mjcf(
            path,
            contact_stiffness=CONTACT_STIFFNESS.get(name, DEFAULT_CONTACT_STIFFNESS),
        )
        if name in CONTACT_LIFT:
            model = model._replace(
                contact_radius=model.contact_radius + CONTACT_LIFT[name]
            )
        arrays = {
            "bodies_parent": model.bodies.parent,
            "bodies_pos": model.bodies.pos,
            "bodies_quat": model.bodies.quat,
            "bodies_mass": model.bodies.mass,
            "bodies_com": model.bodies.com,
            "bodies_inertia": model.bodies.inertia,
            "bodies_dof_start": model.bodies.dof_start,
            "bodies_dof_count": model.bodies.dof_count,
            "joints_body": model.joints.body,
            "joints_jtype": model.joints.jtype,
            "joints_axis": model.joints.axis,
            "joints_anchor": model.joints.anchor,
            "joints_damping": model.joints.damping,
            "joints_limited": model.joints.limited,
            "joints_lower": model.joints.lower,
            "joints_upper": model.joints.upper,
            "joints_stiffness": model.joints.stiffness,
            "joints_armature": model.joints.armature,
            "joints_ref": model.joints.ref,
            "contact_body": model.contact_body,
            "contact_pos": model.contact_pos,
            "contact_radius": model.contact_radius,
            "contact_stiffness": np.asarray(model.contact_stiffness, dtype=np.float64),
            "act_dof": model.act_dof,
            "act_gear": model.act_gear,
            "act_ctrlrange": model.act_ctrlrange,
            "site_body": model.site_body,
            "site_pos": model.site_pos,
            "gravity": np.float64(model.gravity),
            "timestep": np.float64(model.timestep),
            "fluid_density": np.float64(model.fluid_density),
            "fluid_viscosity": np.float64(model.fluid_viscosity),
            "ground_z": np.float64(model.ground_z),
            "meta_json": np.bytes_(json.dumps(meta).encode()),
        }
        np.savez_compressed(os.path.join(OUT, f"{name}.npz"), **arrays)
        print(
            f"{name}: nv={model.nv} nu={model.nu} bodies={len(model.bodies.parent)} "
            f"mass={model.bodies.mass.sum():.2f} contacts={len(model.contact_body)}"
        )


if __name__ == "__main__":
    main()
