"""Compiled-model spec pins: MJCF option parsing and contact-margin
semantics (reference gymnasium/envs/mujoco/assets/*.xml)."""

import numpy as np

from gymnasium_tpu.envs.mujoco.mujoco_env import load_model


def test_swimmer_fluid_option_parsed():
    """swimmer.xml `<option density="4000" viscosity="0.1">` reaches the
    compiled model (the fluid-force pass keys off these — swimmer.py)."""
    model, _ = load_model("swimmer")
    assert model.fluid_density == 4000.0
    assert model.fluid_viscosity == 0.1
    # no other robot declares a medium
    for name in ("ant", "hopper", "half_cheetah", "humanoid"):
        other, _ = load_model(name)
        assert other.fluid_density == 0.0 and other.fluid_viscosity == 0.0, name


def test_swimmer_inertia_box_dims():
    """The equivalent-inertia box of each swimmer link must recover a
    slender x-aligned shape (that anisotropy IS the propulsion)."""
    model, _ = load_model("swimmer")
    inertia = np.asarray(model.bodies.inertia)
    mass = np.asarray(model.bodies.mass)
    evals = np.linalg.eigvalsh(inertia)
    d = np.sqrt(np.maximum(1e-12, evals.sum(-1, keepdims=True) - 2 * evals) * 6.0 / mass[:, None])
    # each link: one long axis (~capsule length+caps), two short (~diameter)
    d = np.sort(d, axis=-1)
    assert (d[:, 2] > 0.9).all() and (d[:, 2] < 1.35).all(), d
    assert (d[:, 0] < 0.35).all(), d


def test_ant_contact_radii_include_margin():
    """ant.xml sets margin=0.01 on every geom (floor included): MuJoCo
    generates contact force while surfaces are includemargin=0.02 apart
    (verified against mj_contactForce), so the compiled contact spheres
    carry radius + 0.02 (mjcf.py margin inflation)."""
    model, _ = load_model("ant")
    # foot capsules have size 0.08 -> inflated spheres 0.10
    assert np.allclose(np.asarray(model.contact_radius)[1:], 0.10), model.contact_radius
    # torso sphere 0.25 -> 0.27
    assert abs(float(model.contact_radius[0]) - 0.27) < 1e-9


def test_margin_free_models_unchanged():
    """half_cheetah.xml declares no margins: radii equal the geom sizes."""
    model, _ = load_model("half_cheetah")
    assert (np.asarray(model.contact_radius) <= 0.25).all()
    # walker2d feet: size 0.05/0.06 exactly (no inflation)
    w, _ = load_model("walker2d_v5")
    radii = np.unique(np.round(np.asarray(w.contact_radius), 3))
    assert 0.05 in radii or 0.06 in radii, radii
