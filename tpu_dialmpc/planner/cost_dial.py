"""Cost-based DIAL-MPC over generic systems (the reference ROS prototype).

Rebuild of DIAL_MPC in dial_mpc/src/control_sequence.cpp:430-538 (commented
out there), TPU-native: candidate rollouts are vmapped `lax.scan`s and the
whole receding-horizon loop is one jitted `lax.scan` — versus the reference's
triple nested sampling loops over one shared mjData.

Algorithm (exactly the reference's math):
  two-level annealing, i = 0..diffusion_levels-1:
    sigma_outer(i)    = sigma_initial * exp(-beta_outer * i)          (:455)
    sigma_inner(i, t) = sigma_outer * exp(-(t/H) / beta_inner)        (:460-462)
  sample num_samples control sequences ~ N(control_seq, sigma_inner(t))
  roll out, cost = sum running_cost + terminal_cost                   (:476-489)
  normalized = (cost - mean) / (std + 1e-6)                           (:492-497)
  weights ∝ exp(-normalized / sigma_outer), control_seq = Σ w_j U_j   (:500-509)
  execute first control, shift sequence with zero tail                (:512-534)
with beta_inner = beta_outer base value log(sigma_i/sigma_f)/H (then /10), and
beta_outer = that + 0.2 (then /10) (:448-452).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_dialmpc.systems.base import System


@dataclasses.dataclass(frozen=True)
class CostDialConfig:
    horizon: int = 20
    steps: int = 100
    diffusion_levels: int = 3
    num_samples: int = 256
    sigma_initial: float = 1.0
    sigma_final: float = 0.1
    seed: int = 0


class CostDialResult(NamedTuple):
    trajectory: jnp.ndarray  # (steps+1, state_dim)
    control_history: jnp.ndarray  # (steps, control_dim)
    costs: jnp.ndarray  # (steps,) executed running cost per step


class CostDialMPC:
    def __init__(self, system: System, config: CostDialConfig = CostDialConfig()):
        self.system = system
        self.cfg = config
        H = config.horizon
        # annealing schedule constants (control_sequence.cpp:448-452)
        base = math.log(config.sigma_initial / config.sigma_final) / H
        self.beta_inner = base / 10.0
        self.beta_outer = (base + 0.2) / 10.0

    # ------------------------------------------------------------------
    def _rollout_cost(self, state0, controls):
        """Total cost of one control sequence from state0 (:476-489)."""
        sys = self.system

        def body(s, u):
            c = sys.running_cost(s, u)
            return sys.dynamics(s, u), c

        s_final, cs = jax.lax.scan(body, state0, controls)
        return cs.sum() + sys.terminal_cost(s_final)

    def improve(self, state, control_sequence, rng):
        """diffusion_levels annealing sweeps on one control sequence."""
        cfg = self.cfg
        H, cd = cfg.horizon, self.system.control_dim
        t_grid = jnp.arange(H, dtype=jnp.float32) / H

        def level(carry, i):
            seq, rng = carry
            sigma_outer = cfg.sigma_initial * jnp.exp(-self.beta_outer * i)
            sigma_inner = sigma_outer * jnp.exp(-t_grid / self.beta_inner)
            rng, krng = jax.random.split(rng)
            eps = jax.random.normal(krng, (cfg.num_samples, H, cd), seq.dtype)
            samples = seq[None] + eps * sigma_inner.astype(seq.dtype)[None, :, None]
            costs = jax.vmap(lambda u: self._rollout_cost(state, u))(samples)
            mean, std = costs.mean(), costs.std()
            normalized = (costs - mean) / (std + 1e-6)
            w = jnp.exp(-normalized / sigma_outer)
            w = w / w.sum()
            return (jnp.einsum("s,shd->hd", w, samples), rng), None

        (seq, _), _ = jax.lax.scan(
            level,
            (control_sequence, rng),
            jnp.arange(cfg.diffusion_levels, dtype=jnp.float32),
        )
        return seq

    # ------------------------------------------------------------------
    def run(self, initial_state) -> CostDialResult:
        """Full receding-horizon solve (:430-538), one jitted scan."""
        cfg = self.cfg
        sys = self.system
        H, cd = cfg.horizon, sys.control_dim

        def step_fn(carry, rng_t):
            state, seq = carry
            seq = self.improve(state, seq, rng_t)
            u0 = seq[0]
            cost = sys.running_cost(state, u0)
            state2 = sys.dynamics(state, u0)
            # shift with zero tail (:529-534)
            seq2 = jnp.concatenate([seq[1:], jnp.zeros((1, cd), seq.dtype)])
            return (state2, seq2), (state2, u0, cost)

        keys = jax.random.split(jax.random.PRNGKey(cfg.seed), cfg.steps)
        state0 = jnp.asarray(initial_state)
        init = (state0, jnp.zeros((H, cd), state0.dtype))
        (_, _), (traj, us, costs) = jax.lax.scan(step_fn, init, keys)
        trajectory = jnp.concatenate([init[0][None], traj], axis=0)
        return CostDialResult(trajectory=trajectory, control_history=us, costs=costs)
