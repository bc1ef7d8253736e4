"""LeggedRobot system: full-state quadratic tracking over the physics pipeline.

Rebuild of the reference prototype's LeggedRobot (dial_mpc/src/
control_sequence.cpp:188-269): state = [qpos(nq); qvel(nv)] (37 for Go2),
control = actuator torques, one mj_step per dynamics call, and diagonal Q/R
costs (pos 50 / joints 5 / vel 1 running; 50/10/5 terminal; R = 0.1 I).

The reference steps ONE shared mjData for every sample (its Q1 aliasing bug
again); here dynamics is a pure function of the state, so vmapped samples are
independent by construction.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from tpu_dialmpc.dynamics import assets, pipeline
from tpu_dialmpc.dynamics.model import compile_model
from tpu_dialmpc.systems.base import System


class LeggedRobot(System):
    def __init__(
        self,
        scene: str = "go2_force",
        target_state: Optional[np.ndarray] = None,
        timestep: float = 0.0025,
    ):
        mj = assets.load_mj_model(scene)
        mj.opt.timestep = timestep
        self.model = compile_model(mj).with_options(timestep=timestep)
        nq, nv, nu = self.model.nq, self.model.nv, self.model.nu
        if target_state is None:
            home = self.model.key_qpos.get("home", np.array(self.model.qpos0))
            target_state = np.concatenate([np.asarray(home), np.zeros(nv)])
        super().__init__(nq + nv, nu, timestep, jnp.asarray(target_state))
        # control_sequence.cpp:192-217 diagonal weights
        q = np.ones(nq + nv)
        q[:3] = 50.0
        q[3:nq] = 5.0
        q[nq:] = 1.0
        qf = np.ones(nq + nv)
        qf[:3] = 50.0
        qf[3:nq] = 10.0
        qf[nq:] = 5.0
        self.Q = jnp.diag(jnp.asarray(q))
        self.Q_terminal = jnp.diag(jnp.asarray(qf))
        self.R = 0.1 * jnp.eye(nu)

    def dynamics(self, state, control):
        nq, nv = self.model.nq, self.model.nv
        ps = pipeline.init(self.model, state[:nq], state[nq:])
        ps2 = pipeline.step(self.model, ps, control, n_substeps=1)
        return jnp.concatenate([ps2.qpos, ps2.qvel])
