"""Gait reference generation (counterpart of unitree-go2-env.h:105-158).

`step_height` is the phase-wrapped clipped-cosine swing profile; `get_foot_step`
evaluates it per foot at T = 2π·cadence·t + π.  Pure jnp, batched over feet.
"""

from __future__ import annotations

import jax.numpy as jnp

# phases per foot (FL, FR, RL, RR order of feet sites), and
# (duty_ratio, cadence, amplitude) — unitree-go2-env.h:758-772
GAIT_PHASES = {
    "stand": (0.0, 0.0, 0.0, 0.0),
    "walk": (0.0, 0.5, 0.75, 0.25),
    "trot": (0.0, 0.5, 0.5, 0.0),
    "canter": (0.0, 0.33, 0.33, 0.66),
    "gallop": (0.0, 0.05, 0.4, 0.35),
    # all four feet IN phase: the swing profile commands simultaneous
    # lift-off, which the torso can only satisfy ballistically — periodic
    # jumping (the "jump" half of BASELINE configs[3]; no reference
    # counterpart — the reference's gait table stops at gallop,
    # unitree-go2-env.h:758-772)
    "pronk": (0.0, 0.0, 0.0, 0.0),
    # crate climbing: walk phase order (one foot in swing at a time keeps
    # three supports loaded while a leg reaches up the step)
    "climb": (0.0, 0.5, 0.75, 0.25),
}
GAIT_PARAMS = {
    "stand": (1.0, 1.0, 0.0),
    "walk": (0.75, 1.0, 0.08),
    "trot": (0.45, 2.0, 0.08),
    "canter": (0.4, 4.0, 0.06),
    "gallop": (0.3, 3.5, 0.10),
    # duty 0.4: 0.4 s of stance to load the legs per 0.67 s cycle (1.5 Hz);
    # amplitude 0.18 m demands a real flight phase (apex ballistics ~0.16 s
    # airborne), well past grazing-lift noise
    "pronk": (0.4, 1.5, 0.18),
    # swing amplitude must clear the 0.30 m crate lip from ground level
    # (measured failure at 0.16: front feet swung 0.11-0.14 and the planner
    # parked 0.15 m from the box face — every approach candidate stumbled
    # into the lip); slow cadence gives each reach-up a full ~0.45 s swing
    "climb": (0.55, 1.0, 0.35),
}

# biped gaits for H1 (no reference counterpart — H1 envs exist only as model
# assets in the reference; parameters follow the same convention)
BIPED_GAIT_PHASES = {
    "stand": (0.0, 0.0),
    "walk": (0.0, 0.5),
    "jog": (0.0, 0.5),
}
BIPED_GAIT_PARAMS = {
    "stand": (1.0, 1.0, 0.0),
    "walk": (0.5, 1.0, 0.1),
    "jog": (0.3, 2.0, 0.1),
}


def step_height(t, footphase, duty_ratio):
    """Swing height profile (unitree-go2-env.h:105-135), branch-free jnp."""
    angle = jnp.mod(t + jnp.pi - footphase, 2.0 * jnp.pi) - jnp.pi
    angle = jnp.where(duty_ratio < 1.0, angle * 0.5 / (1.0 - duty_ratio + 1e-12), angle)
    clipped = jnp.clip(angle, -jnp.pi / 2.0, jnp.pi / 2.0)
    value = jnp.where(duty_ratio < 1.0, jnp.cos(clipped), 0.0)
    return jnp.where(jnp.abs(value) >= 1e-6, jnp.abs(value), 0.0)


def get_foot_step(duty_ratio, cadence, amplitude, phases, time):
    """Per-foot target heights (unitree-go2-env.h:141-158)."""
    t = time * 2.0 * jnp.pi * cadence + jnp.pi
    return amplitude * step_height(t, 2.0 * jnp.pi * phases, duty_ratio)
