"""Abstract dynamical system for the cost-based DIAL-MPC prototype.

Rebuild of the reference's `System` base (dial_mpc/src/control_sequence.cpp:
27-49, commented out there): `dynamics` advances one state by dt under one
control; `running_cost`/`terminal_cost` are quadratic tracking costs.  Unlike
the Eigen version (which loops over a matrix of stacked states), methods here
are single-sample and pure — batching is `jax.vmap`, exactly like the env
layer.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


class System:
    state_dim: int
    control_dim: int
    dt: float

    def __init__(self, state_dim: int, control_dim: int, dt: float,
                 target_state: Optional[jnp.ndarray] = None):
        self.state_dim = state_dim
        self.control_dim = control_dim
        self.dt = dt
        self.target_state = (
            jnp.zeros(state_dim) if target_state is None else jnp.asarray(target_state)
        )
        # quadratic weights set by subclasses
        self.Q = jnp.eye(state_dim)
        self.R = 0.1 * jnp.eye(control_dim)
        self.Q_terminal = jnp.eye(state_dim)

    # -- to implement --------------------------------------------------
    def dynamics(self, state: jnp.ndarray, control: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    # -- shared quadratic costs (control_sequence.cpp:89-106 etc.) -----
    def running_cost(self, state: jnp.ndarray, control: jnp.ndarray) -> jnp.ndarray:
        d = state - self.target_state
        return d @ (self.Q @ d) + control @ (self.R @ control)

    def terminal_cost(self, state: jnp.ndarray) -> jnp.ndarray:
        d = state - self.target_state
        return d @ (self.Q_terminal @ d)
