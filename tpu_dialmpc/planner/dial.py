"""DIAL-MPC planner (MBDPI): diffusion-style annealed sampling MPC.

TPU-native re-design of the reference MBDPI (dial_mpc_eigen/include/dial-core.h:381-644):

- node↔dense spline transforms are precomputed linear maps (core/spline.py), so
  candidate generation is one fused einsum instead of per-sample tridiagonal
  solves (dial-core.h:516-523).
- `rollout_us` is a `lax.scan` over the horizon (the serial axis), vmapped over
  the Nsample+1 candidates (the parallel axis) — replacing the reference's
  sequential double loop (dial-core.h:423-456).  Every candidate rolls from the
  same snapshot (fixes reference quirk Q1).
- `reverse_once` is a single jitted function: noise → clip/pin → node2u →
  vmap(scan(env.step)) → score → stable softmax → weighted update
  (dial-core.h:469-593).
- the annealing chain (`reverse`, dial-core.h:598-614) and the per-control-step
  improvement loop (dial-core-test.cpp:64-99) are `lax.scan`s with the
  iteration-dependent noise schedule precomputed, so the two n_diffuse variants
  (Ndiffuse_init at t=0, Ndiffuse after) compile exactly once each.

PRNG: `jax.random` keys split per (control-step, iteration); sampling is a
single batched normal draw, replacing the reference's sequential mt19937 draws
(quirk Q3).  `reverse_once` accepts injected noise for parity harnesses.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_dialmpc.core import spline
from tpu_dialmpc.envs.base import EnvState


@dataclasses.dataclass(frozen=True)
class DialConfig:
    """Planner hyperparameters (dial-core.h:35-49)."""

    seed: int = 0
    Hsample: int = 16
    Hnode: int = 4
    Nsample: int = 20
    Ndiffuse: int = 2
    Ndiffuse_init: int = 10
    temp_sample: float = 0.05
    horizon_diffuse_factor: float = 0.5
    ctrl_dt: float = 0.02
    n_steps: int = 400
    traj_diffuse_factor: float = 0.5
    update_method: str = "mppi"
    # --- extensions ---
    spline_mode: str = "ref"  # "ref" replicates the C++ spline quirks
    # Reference quirk Q9 (scoring): the upstream Python normalizes logits by
    # the SCALAR std of the per-sample mean rewards (`rews.std(axis=-1)` on a
    # 1-D array, dial_core.py), but the C++ re-reads that line as a per-sample
    # std across TIME (dial-core.h:529-564 and the comment right above it) —
    # which explodes logits for low-variance candidates and destabilizes
    # locomotion.  "sample" (default) = upstream semantics; "time" = C++.
    score_std: str = "sample"
    # Reference quirk Q1 compat (SURVEY §2.5): the C++ shares one mutable
    # mjData across candidate rollouts, so candidate i starts from candidate
    # i-1's terminal physics state (dial-core.h:443-456 + unitree-go2-env.h:433).
    # True replicates that (sequential chaining — parity harness only);
    # False (default) rolls every candidate from the common snapshot.
    compat_q1: bool = False
    # Q4 state diagnostics (dial-core.h:577-589): the C++ ships zero
    # placeholders for qbar/qdbar/xbar because it never stores rollout
    # states ("If you want real data, store states from each rollout").
    # The upstream Python computes softmax-weighted rollout-state averages;
    # diag_states=True does the same here (qbar over qpos, qdbar over qvel,
    # xbar over the torso world position, all on the dense horizon).
    # False keeps the C++ placeholder shapes (1,1) zeros and skips the
    # extra rollout outputs on the hot path.
    diag_states: bool = False


class ReverseInfo(NamedTuple):
    """Per-iteration diagnostics (dial-core.h:459-467 'ReverseInfo').

    The reference computes `rews` and zero placeholders (quirk Q4); we surface
    the useful statistics the plotting fork printed by hand.
    """

    rews: jnp.ndarray  # (Nsample+1,) per-candidate mean rewards
    rew_Ybar: jnp.ndarray  # scalar: mean reward of the anchor trajectory
    weights: jnp.ndarray  # (Nsample+1,) softmax weights
    ess: jnp.ndarray  # effective sample size 1/Σw²
    entropy: jnp.ndarray  # softmax weight entropy
    new_noise_scale: jnp.ndarray  # (Hnode+1,) — unchanged (quirk Q5)
    # Q4 weighted state averages (dial-core.h:577-589; zeros placeholders
    # of shape (1, 1) unless DialConfig.diag_states — matching the C++):
    qbar: jnp.ndarray  # (Hsample+1, nq) softmax-weighted rollout qpos
    qdbar: jnp.ndarray  # (Hsample+1, nv) softmax-weighted rollout qvel
    xbar: jnp.ndarray  # (Hsample+1, 3) softmax-weighted torso position


class MBDPI:
    """Model-Based Diffusion Planner (dial-core.h:381-644)."""

    def __init__(self, args: DialConfig, env):
        self.args = args
        self.env = env
        self.nu = env.action_size

        # sigma schedule (dial-core.h:388-395)
        sigma0, sigma1 = 1e-2, 1.0
        B = np.log(sigma1 / sigma0) / args.Ndiffuse
        self.sigmas = sigma0 * np.exp(B * np.arange(args.Ndiffuse))
        # per-node noise schedule (dial-core.h:397-404)
        self.sigma_control = args.horizon_diffuse_factor ** np.arange(
            args.Hnode, -1, -1
        )
        # time grids (dial-core.h:406-417) are implicit in the linear maps:
        mode = args.spline_mode
        self._node2u = jnp.asarray(
            spline.node2u_matrix(args.Hnode, args.Hsample, args.ctrl_dt, mode)
        )
        self._u2node = jnp.asarray(
            spline.u2node_matrix(args.Hnode, args.Hsample, args.ctrl_dt, mode)
        )
        self._shift = jnp.asarray(
            spline.shift_matrix(args.Hnode, args.Hsample, args.ctrl_dt, mode)
        )

    # ------------------------------------------------------------------
    def node2u(self, nodes: jnp.ndarray) -> jnp.ndarray:
        """(..., Hnode+1, nu) -> (..., Hsample+1, nu) dense controls."""
        A = self._node2u.astype(nodes.dtype)
        return jnp.einsum("qn,...nu->...qu", A, nodes)

    def u2node(self, us: jnp.ndarray) -> jnp.ndarray:
        A = self._u2node.astype(us.dtype)
        return jnp.einsum("qn,...nu->...qu", A, us)

    def shift(self, Y: jnp.ndarray) -> jnp.ndarray:
        """Receding-horizon shift as one precomposed linear map (dial-core.h:621-633)."""
        A = self._shift.astype(Y.dtype)
        return jnp.einsum("qn,...nu->...qu", A, Y)

    # ------------------------------------------------------------------
    # Rollouts carry only the *live* state (qpos, qvel, warmstart, info):
    # env.step never reads the derived kinematic fields of its input, so
    # keeping them in the scan carry would thread ~5x dead data through the
    # loop (and pin layouts).  The full EnvState template is closed over just
    # for pytree structure; its derived fields are dead code under the scan.
    def _lean(self, state):
        if not hasattr(state, "pipeline"):
            return state  # non-physics envs (tests): the whole state is live
        return (
            state.pipeline.qpos,
            state.pipeline.qvel,
            state.pipeline.qacc_warmstart,
            state.info,
        )

    def _restore(self, template, carry):
        if not hasattr(template, "pipeline"):
            return carry
        qpos, qvel, ws, info = carry
        return template._replace(
            pipeline=template.pipeline._replace(
                qpos=qpos, qvel=qvel, qacc_warmstart=ws
            ),
            info=info,
        )

    def rollout_us(self, state: EnvState, us: jnp.ndarray):
        """Full reward sequence for a dense control matrix (dial-core.h:423-440)."""

        def body(carry, u):
            s2 = self.env.step(self._restore(state, carry), u)
            return self._lean(s2), s2.reward

        final, rews = jax.lax.scan(body, self._lean(state), us)
        return rews, final

    def rollout_us_batch(self, state: EnvState, all_us: jnp.ndarray):
        """vmap over candidates; every rollout starts from `state` (fixes Q1).

        On TPU, envs with fused-kernel support take the single-Pallas-call
        physics path (envs/fused_rollout.py) — same math, ~100x faster.
        The initial carry is broadcast to the batch explicitly — vmapping a
        closed-over (unbatched) state measured ~13x slower on TPU.
        """
        if hasattr(self.env, "rollout_batch"):
            rews = self.env.rollout_batch(state, all_us)
            if rews is not None:
                return rews
        B = all_us.shape[0]
        carry0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), self._lean(state)
        )

        def one(carry, us):
            def body(c, u):
                s2 = self.env.step(self._restore(state, c), u)
                return self._lean(s2), s2.reward

            _, rews = jax.lax.scan(body, carry, us)
            return rews

        return jax.vmap(one)(carry0, all_us)

    def rollout_us_batch_diag(self, state: EnvState, all_us: jnp.ndarray):
        """Rollouts that also return state trajectories (Q4 diagnostics).

        Returns (rewss (B,T), qss (B,T,nq), qdss (B,T,nv), xss (B,T,3)) —
        the per-step rollout states whose softmax-weighted averages are the
        qbar/qdbar/xbar the C++ left as placeholders (dial-core.h:577-589).
        """
        if hasattr(self.env, "rollout_batch"):
            out = self.env.rollout_batch(state, all_us, want_states=True)
            if out is not None:
                return out
        torso = getattr(self.env, "_torso_idx", None)
        B = all_us.shape[0]
        carry0 = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), self._lean(state)
        )

        def one(carry, us):
            def body(c, u):
                s2 = self.env.step(self._restore(state, c), u)
                xpos = (
                    s2.pipeline.xpos[torso]
                    if torso is not None
                    else s2.pipeline.qpos[:3]
                )
                return self._lean(s2), (
                    s2.reward,
                    s2.pipeline.qpos,
                    s2.pipeline.qvel,
                    xpos,
                )

            _, outs = jax.lax.scan(body, carry, us)
            return outs

        rewss, qss, qdss, xss = jax.vmap(one)(carry0, all_us)
        return rewss, qss, qdss, xss

    def rollout_us_batch_compat_q1(self, state: EnvState, all_us: jnp.ndarray):
        """Reference-quirk-Q1 rollouts: candidates chained sequentially.

        The physics carry (qpos, qvel, warmstart) persists across candidates
        (the shared-mjData behavior); StateInfo resets to the snapshot's per
        candidate (C++ EnvState copies are by-value except the data pointer).
        Returns (rewss, final_phys_carry) — the C++ even *executes* its next
        control from that final rollout state.  Parity fixture, not for
        production.
        """
        info0 = state.info

        def one_candidate(phys_carry, us):
            def body(c, u):
                phys, info = c
                qpos, qvel, ws = phys
                s = self._restore(state, (qpos, qvel, ws, info))
                s2 = self.env.step(s, u)
                lean = self._lean(s2)
                return ((lean[0], lean[1], lean[2]), lean[3]), s2.reward

            (phys_out, _), rews = jax.lax.scan(body, (phys_carry, info0), us)
            return phys_out, rews

        phys0 = self._lean(state)[:3]
        phys_final, rewss = jax.lax.scan(one_candidate, phys0, all_us)
        return rewss, phys_final

    # ------------------------------------------------------------------
    def _candidates(self, rng, Ybar_i, noise_scale, noise):
        """Noisy node-trajectory candidates + appended anchor (dial-core.h:477-514)."""
        args = self.args
        dtype = Ybar_i.dtype
        if noise is None:
            noise = jax.random.normal(
                rng, (args.Nsample, args.Hnode + 1, self.nu), dtype
            )
        eps = noise * noise_scale.astype(dtype)[None, :, None]
        Y0s = Ybar_i[None] + eps
        # pin the first (currently executing) node (dial-core.h:493)
        Y0s = Y0s.at[:, 0, :].set(Ybar_i[0])
        all_Y0s = jnp.concatenate([Y0s, Ybar_i[None]], axis=0)
        return jnp.clip(all_Y0s, -1.0, 1.0)

    def _score_update(self, rewss, all_Y0s, noise_scale, diag=None):
        """Score, softmax, weighted average (dial-core.h:529-592).

        `diag` is an optional (qss, qdss, xss) tuple of rollout-state
        trajectories; when given, the Q4 weighted averages are computed with
        the same softmax weights as the control update."""
        args = self.args
        rews = rewss.mean(axis=-1)
        rew_Ybar = rewss[-1].mean()
        if args.score_std == "time":
            # C++ quirk Q9: per-sample std across time, with the reference's
            # variance floor (dial-core.h:541-556)
            var = jnp.mean((rewss - rews[:, None]) ** 2, axis=-1)
            std = jnp.where(var > 1e-14, jnp.sqrt(var), 1e-7)
        else:
            # upstream dial-mpc: scalar std of the mean rewards across samples
            std = jnp.maximum(rews.std(), 1e-7)
        logp0 = (rews - rew_Ybar) / (std * args.temp_sample)
        logp0 = logp0 - jnp.max(logp0)
        weights = jax.nn.softmax(logp0)
        Ybar = jnp.einsum("n,nij->ij", weights, all_Y0s)
        if diag is not None:
            qss, qdss, xss = diag
            qbar = jnp.einsum("n,ntj->tj", weights, qss)
            qdbar = jnp.einsum("n,ntj->tj", weights, qdss)
            xbar = jnp.einsum("n,ntj->tj", weights, xss)
        else:
            # C++ placeholder semantics (dial-core.h:577-589)
            z = jnp.zeros((1, 1), rewss.dtype)
            qbar = qdbar = xbar = z
        info = ReverseInfo(
            rews=rews,
            rew_Ybar=rew_Ybar,
            weights=weights,
            ess=1.0 / jnp.sum(weights**2),
            entropy=-jnp.sum(weights * jnp.log(weights + 1e-30)),
            new_noise_scale=noise_scale,
            qbar=qbar,
            qdbar=qdbar,
            xbar=xbar,
        )
        return Ybar, info

    def reverse_once(
        self,
        state: EnvState,
        rng: jnp.ndarray,
        Ybar_i: jnp.ndarray,
        noise_scale: jnp.ndarray,
        noise: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, ReverseInfo]:
        """One annealing step (dial-core.h:469-593)."""
        all_Y0s = self._candidates(rng, Ybar_i, noise_scale, noise)
        all_us = self.node2u(all_Y0s)  # (Nsample+1, Hsample+1, nu)
        diag = None
        if self.args.compat_q1:
            rewss, _ = self.rollout_us_batch_compat_q1(state, all_us)
        elif self.args.diag_states and hasattr(state, "pipeline"):
            rewss, *diag = self.rollout_us_batch_diag(state, all_us)
        else:
            rewss = self.rollout_us_batch(state, all_us)  # (Nsample+1, T)
        return self._score_update(rewss, all_Y0s, noise_scale, diag=diag)

    def reverse_once_compat(
        self,
        state: EnvState,
        rng: jnp.ndarray,
        Ybar_i: jnp.ndarray,
        noise_scale: jnp.ndarray,
        noise: Optional[jnp.ndarray] = None,
    ):
        """Q1-compat annealing step, additionally returning the final chained
        physics carry (qpos, qvel, warmstart) — the C++ executes its next
        control from exactly that state (shared mjData).  Parity fixture."""
        all_Y0s = self._candidates(rng, Ybar_i, noise_scale, noise)
        all_us = self.node2u(all_Y0s)
        rewss, phys_final = self.rollout_us_batch_compat_q1(state, all_us)
        Ybar, info = self._score_update(rewss, all_Y0s, noise_scale)
        return Ybar, info, phys_final

    # ------------------------------------------------------------------
    def reverse(
        self, state: EnvState, YN: jnp.ndarray, rng: jnp.ndarray
    ) -> jnp.ndarray:
        """Warm-start chain: i = Ndiffuse-1 … 1 (dial-core.h:598-614)."""
        args = self.args
        if args.Ndiffuse < 2:
            return YN
        scales = jnp.asarray(
            np.stack(
                [
                    np.full(args.Hnode + 1, self.sigmas[i])
                    for i in range(args.Ndiffuse - 1, 0, -1)
                ]
            ),
            YN.dtype,
        )
        keys = jax.random.split(rng, scales.shape[0])

        def body(Y, inp):
            key, scale = inp
            Y2, _ = self.reverse_once(state, key, Y, scale)
            return Y2, None

        Y, _ = jax.lax.scan(body, YN, (keys, scales))
        return Y

    # ------------------------------------------------------------------
    def improve(
        self,
        state: EnvState,
        Y0: jnp.ndarray,
        rng: jnp.ndarray,
        n_diffuse: int,
    ) -> Tuple[jnp.ndarray, ReverseInfo]:
        """n_diffuse reverse_once steps with the annealed schedule
        factor = sigma_control · traj_diffuse_factor^i  (dial-core-test.cpp:84-92).

        n_diffuse is static — the two variants (Ndiffuse_init / Ndiffuse)
        compile once each.
        """
        args = self.args
        scales = jnp.asarray(
            np.stack(
                [
                    self.sigma_control * args.traj_diffuse_factor**i
                    for i in range(n_diffuse)
                ]
            ),
            Y0.dtype,
        )
        keys = jax.random.split(rng, n_diffuse)

        def body(Y, inp):
            key, scale = inp
            Y2, info = self.reverse_once(state, key, Y, scale)
            return Y2, info

        Y, infos = jax.lax.scan(body, Y0, (keys, scales))
        return Y, infos
