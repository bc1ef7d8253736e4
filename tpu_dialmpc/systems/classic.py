"""Inverted pendulum and cartpole systems.

Constants, costs and integration exactly mirror the reference prototype
(dial_mpc/src/control_sequence.cpp:52-107 pendulum, :110-180 cartpole),
re-expressed as pure JAX single-sample functions.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_dialmpc.systems.base import System


class InvertedPendulum(System):
    """theta=0 is down; target (pi, 0) is the swing-up goal
    (control_sequence.cpp:52-107: Q=diag(10,1), R=0.1, Qf=diag(50,5), dt=0.1)."""

    def __init__(self, target_state=(jnp.pi, 0.0), dt: float = 0.1):
        super().__init__(2, 1, dt, jnp.asarray(target_state))
        self.Q = jnp.diag(jnp.array([10.0, 1.0]))
        self.R = jnp.array([[0.1]])
        self.Q_terminal = jnp.diag(jnp.array([50.0, 5.0]))
        self.g, self.l, self.m = 9.81, 1.0, 1.0

    def dynamics(self, state, control):
        theta, theta_dot = state[0], state[1]
        torque = control[0]
        theta_ddot = (torque - self.m * self.g * self.l * jnp.sin(theta)) / (
            self.m * self.l * self.l
        )
        return jnp.stack(
            [theta + theta_dot * self.dt, theta_dot + theta_ddot * self.dt]
        )


class Cartpole(System):
    """Classic cartpole (control_sequence.cpp:110-180: Q=diag(1,1,10,1),
    R=0.1, Qf=diag(10,10,50,5), dt=0.05); target = upright at origin."""

    def __init__(self, target_state=(0.0, 0.0, 0.0, 0.0), dt: float = 0.05):
        super().__init__(4, 1, dt, jnp.asarray(target_state))
        self.Q = jnp.diag(jnp.array([1.0, 1.0, 10.0, 1.0]))
        self.R = jnp.array([[0.1]])
        self.Q_terminal = jnp.diag(jnp.array([10.0, 10.0, 50.0, 5.0]))

    def dynamics(self, state, control):
        g, m_cart, m_pole, l = 9.81, 1.0, 0.1, 0.5
        total_mass = m_cart + m_pole
        polemass_length = m_pole * l
        x, x_dot, theta, theta_dot = state[0], state[1], state[2], state[3]
        force = control[0]
        sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
        temp = (force + polemass_length * theta_dot**2 * sin_t) / total_mass
        theta_ddot = (g * sin_t - cos_t * temp) / (
            l * (4.0 / 3.0 - m_pole * cos_t * cos_t / total_mass)
        )
        x_ddot = temp - polemass_length * theta_ddot * cos_t / total_mass
        dt = self.dt
        return jnp.stack(
            [
                x + x_dot * dt,
                x_dot + x_ddot * dt,
                theta + theta_dot * dt,
                theta_dot + theta_ddot * dt,
            ]
        )
