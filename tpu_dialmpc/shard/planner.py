"""Sample-parallel MBDPI: the annealing step sharded over a device mesh.

Design (GSPMD/pjit, not hand-written collectives): the (Nsample, Hnode+1, nu)
candidate tensor and its rollouts carry sharding constraints on the sample
axis; XLA then lowers
  - the softmax max/sum (dial-core.h:566-570) to a pmax/psum logsumexp over
    the mesh, and
  - the weighted update Σ wᵢY0sᵢ (dial-core.h:370-375) to locally-weighted
    partial sums + one psum of (Hnode+1, nu)
exactly as a hand-rolled shard_map would, but fused with the rollout
computation.  The anchor trajectory Ybar is rolled out redundantly on every
device (1/Nsample extra work) so the sharded axis stays exactly Nsample.

Determinism: noise is drawn with the partitionable threefry generator keyed by
global sample index, so Nsample=2048 yields bit-identical candidates on 1 chip
and on any mesh shape.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from tpu_dialmpc.envs.base import EnvState
from tpu_dialmpc.planner.dial import DialConfig, MBDPI, ReverseInfo

jax.config.update("jax_threefry_partitionable", True)


class ShardedMBDPI(MBDPI):
    """MBDPI with the sample axis sharded over `mesh`."""

    def __init__(self, args: DialConfig, env, mesh: Mesh):
        super().__init__(args, env)
        self.mesh = mesh
        self._sample_sharding = NamedSharding(
            mesh, PartitionSpec(("dcn", "sample"))
        )

    def _shard(self, x):
        return jax.lax.with_sharding_constraint(x, self._sample_sharding)

    def rollout_us_batch(self, state: EnvState, all_us: jnp.ndarray):
        """Sharded rollouts.

        The fused Pallas kernel (envs/fused_rollout.py) is a per-device
        program, so under a >1-device mesh it runs inside `shard_map` over the
        sample axis — each device rolls its local candidate block through one
        kernel; the scoring collectives stay GSPMD outside.  The XLA-pipeline
        fallback shards transparently via the sharding constraints.
        """
        n_dev = self.mesh.devices.size
        if n_dev > 1 and getattr(self.env, "rollout_batch", None) is not None:
            if all_us.shape[0] % n_dev == 0:
                probe = self.env._get_fused_step(all_us.shape[0] // n_dev)[0]
                if probe is not None:
                    spec = PartitionSpec(("dcn", "sample"))

                    def local(state_rep, us_local):
                        return self.env.rollout_batch(state_rep, us_local)

                    return jax.shard_map(
                        local,
                        mesh=self.mesh,
                        in_specs=(PartitionSpec(), spec),
                        out_specs=spec,
                        check_vma=False,
                    )(state, all_us)
        return super().rollout_us_batch(state, all_us)

    def rollout_us_batch_diag(self, state: EnvState, all_us: jnp.ndarray):
        """Sharded rollouts that also return state trajectories (Q4).

        Same dispatch as `rollout_us_batch`: fused-kernel envs run inside
        `shard_map` over the sample axis (state outputs shard like rewards);
        the XLA fallback shards via constraints."""
        n_dev = self.mesh.devices.size
        if n_dev > 1 and getattr(self.env, "rollout_batch", None) is not None:
            if all_us.shape[0] % n_dev == 0:
                probe = self.env._get_fused_step(all_us.shape[0] // n_dev)[0]
                if probe is not None:
                    spec = PartitionSpec(("dcn", "sample"))

                    def local(state_rep, us_local):
                        return self.env.rollout_batch(
                            state_rep, us_local, want_states=True
                        )

                    return jax.shard_map(
                        local,
                        mesh=self.mesh,
                        in_specs=(PartitionSpec(), spec),
                        out_specs=(spec, spec, spec, spec),
                        check_vma=False,
                    )(state, all_us)
        return tuple(
            self._shard(o) for o in super().rollout_us_batch_diag(state, all_us)
        )

    def reverse_once(
        self,
        state: EnvState,
        rng: jnp.ndarray,
        Ybar_i: jnp.ndarray,
        noise_scale: jnp.ndarray,
        noise: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, ReverseInfo]:
        args = self.args
        dtype = Ybar_i.dtype
        if noise is None:
            noise = jax.random.normal(
                rng, (args.Nsample, args.Hnode + 1, self.nu), dtype
            )
        noise = self._shard(noise)
        eps = noise * noise_scale.astype(dtype)[None, :, None]
        Y0s = Ybar_i[None] + eps
        Y0s = Y0s.at[:, 0, :].set(Ybar_i[0])
        Y0s = jnp.clip(Y0s, -1.0, 1.0)
        Y0s = self._shard(Y0s)
        Ybar_c = jnp.clip(Ybar_i, -1.0, 1.0)

        us = self._shard(self.node2u(Y0s))  # (Nsample, Hsample+1, nu)
        diag = args.diag_states and hasattr(state, "pipeline")
        if diag:
            rewss, qss, qdss, xss = self.rollout_us_batch_diag(state, us)
            rewss = self._shard(rewss)
            # anchor rollout (B=1, replicated) with states for the Q4 average
            rews_ybar_t, q_y, qd_y, x_y = (
                o[0]
                for o in super().rollout_us_batch_diag(
                    state, self.node2u(Ybar_c)[None]
                )
            )
        else:
            rewss = self._shard(self.rollout_us_batch(state, us))  # (Nsample, T)
            # anchor rollout as a B=1 batch so it rides the fused kernel path
            # too (a bare env.step scan would cost ~10x the sharded batch)
            rews_ybar_t = self.rollout_us_batch(
                state, self.node2u(Ybar_c)[None]
            )[0]

        rews = rewss.mean(axis=-1)  # (Nsample,) sharded
        rew_Ybar = rews_ybar_t.mean()  # replicated scalar
        if args.score_std == "time":
            # C++ quirk Q9 (see planner/dial.py): per-sample std across time
            var = jnp.mean((rewss - rews[:, None]) ** 2, axis=-1)
            std = jnp.where(var > 1e-14, jnp.sqrt(var), 1e-7)
            var_y = jnp.mean((rews_ybar_t - rew_Ybar) ** 2)
            std_y = jnp.where(var_y > 1e-14, jnp.sqrt(var_y), 1e-7)
        else:
            # upstream: scalar std across all Nsample+1 mean rewards — the
            # mean/variance reductions lower to mesh collectives under GSPMD
            n_all = args.Nsample + 1
            mean_all = (jnp.sum(rews) + rew_Ybar) / n_all
            var_all = (
                jnp.sum((rews - mean_all) ** 2) + (rew_Ybar - mean_all) ** 2
            ) / n_all
            std = std_y = jnp.maximum(jnp.sqrt(var_all), 1e-7)
        logp0 = (rews - rew_Ybar) / (std * args.temp_sample)
        logp_ybar = (rew_Ybar - rew_Ybar) / (std_y * args.temp_sample)

        # global stable softmax over Nsample sharded + 1 replicated score:
        # XLA lowers the max/sum reductions to mesh collectives.
        m = jnp.maximum(jnp.max(logp0), logp_ybar)
        e = jnp.exp(logp0 - m)
        e_ybar = jnp.exp(logp_ybar - m)
        denom = jnp.sum(e) + e_ybar
        w = e / denom  # sharded (Nsample,)
        w_ybar = e_ybar / denom

        # weighted update: local partial sums + psum of (Hnode+1, nu)
        Ybar = jnp.einsum("n,nij->ij", w, Y0s) + w_ybar * Ybar_c

        if diag:
            # weighted state averages (Q4): sharded einsum + replicated anchor
            qbar = jnp.einsum("n,ntj->tj", w, qss) + w_ybar * q_y
            qdbar = jnp.einsum("n,ntj->tj", w, qdss) + w_ybar * qd_y
            xbar = jnp.einsum("n,ntj->tj", w, xss) + w_ybar * x_y
        else:
            z = jnp.zeros((1, 1), rewss.dtype)
            qbar = qdbar = xbar = z

        rews_all = jnp.concatenate([rews, rew_Ybar[None]])
        w_all = jnp.concatenate([w, w_ybar[None]])
        info = ReverseInfo(
            rews=rews_all,
            rew_Ybar=rew_Ybar,
            weights=w_all,
            ess=1.0 / jnp.sum(w_all**2),
            entropy=-jnp.sum(w_all * jnp.log(w_all + 1e-30)),
            new_noise_scale=noise_scale,
            qbar=qbar,
            qdbar=qdbar,
            xbar=xbar,
        )
        return Ybar, info
