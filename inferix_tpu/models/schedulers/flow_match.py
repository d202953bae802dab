"""Flow-matching noise schedule, functional JAX.

Numerical parity with the reference `FlowMatchScheduler`
(`inferix/models/schedulers/flow_match.py:108-193`): shifted sigmas
`shift*s/(1+(shift-1)*s)` over linspace(sigma_max..sigma_min), timestep ->
sigma lookup by nearest timestep, `add_noise = (1-sigma)*x0 + sigma*noise`,
and the flow->x0 conversion `x0 = x_t - sigma_t * flow`
(`models/self_forcing/wrapper.py:259-283`). Tables are built in float64 on
host; device math runs in float32 (the reference's float64 promotion is a CPU
nicety that would cripple TPU throughput; fp32 is well within the VBench
tolerance at these step counts).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["sigmas", "timesteps"],
    meta_fields=["num_train_timesteps"],
)
@dataclasses.dataclass(frozen=True)
class FlowMatchSchedule:
    """Immutable schedule tables (host-built, device-resident). Registered as
    a pytree so it can flow through jit boundaries as an argument."""

    sigmas: jax.Array      # [N] float32
    timesteps: jax.Array   # [N] float32 (sigmas * num_train_timesteps)
    num_train_timesteps: int = 1000

    @classmethod
    def create(
        cls,
        num_inference_steps: int = 1000,
        num_train_timesteps: int = 1000,
        shift: float = 8.0,
        sigma_max: float = 1.0,
        sigma_min: float = 0.0,
        extra_one_step: bool = True,
        denoising_strength: float = 1.0,
    ) -> "FlowMatchSchedule":
        sigma_start = sigma_min + (sigma_max - sigma_min) * denoising_strength
        if extra_one_step:
            sigmas = np.linspace(
                sigma_start, sigma_min, num_inference_steps + 1, dtype=np.float64
            )[:-1]
        else:
            sigmas = np.linspace(
                sigma_start, sigma_min, num_inference_steps, dtype=np.float64
            )
        sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
        timesteps = sigmas * num_train_timesteps
        return cls(
            sigmas=jnp.asarray(sigmas, jnp.float32),
            timesteps=jnp.asarray(timesteps, jnp.float32),
            num_train_timesteps=num_train_timesteps,
        )

    def timestep_id(self, timestep: jax.Array) -> jax.Array:
        """Nearest-timestep lookup (reference argmin |timesteps - t|)."""
        t = timestep.astype(jnp.float32)
        return jnp.argmin(
            jnp.abs(self.timesteps[None, :] - t.reshape(-1)[:, None]), axis=1
        ).reshape(t.shape)

    def sigma_at(self, timestep: jax.Array) -> jax.Array:
        return self.sigmas[self.timestep_id(timestep)]

    def add_noise(
        self, x0: jax.Array, noise: jax.Array, timestep: jax.Array
    ) -> jax.Array:
        """Corrupt x0 to noise level `timestep`. timestep broadcastable to the
        leading dims of x0 (per-frame in the semi-AR loop)."""
        sigma = self.sigma_at(timestep)
        sigma = sigma.reshape(sigma.shape + (1,) * (x0.ndim - sigma.ndim))
        out = (1.0 - sigma) * x0.astype(jnp.float32) + sigma * noise.astype(jnp.float32)
        return out.astype(noise.dtype)

    def flow_to_x0(
        self, flow_pred: jax.Array, xt: jax.Array, timestep: jax.Array
    ) -> jax.Array:
        """x0 = x_t - sigma_t * flow (flow = noise - x0)."""
        sigma = self.sigma_at(timestep)
        sigma = sigma.reshape(sigma.shape + (1,) * (xt.ndim - sigma.ndim))
        x0 = xt.astype(jnp.float32) - sigma * flow_pred.astype(jnp.float32)
        return x0.astype(xt.dtype)

    def x0_to_flow(
        self, x0: jax.Array, xt: jax.Array, timestep: jax.Array
    ) -> jax.Array:
        sigma = self.sigma_at(timestep)
        sigma = sigma.reshape(sigma.shape + (1,) * (xt.ndim - sigma.ndim))
        flow = (xt.astype(jnp.float32) - x0.astype(jnp.float32)) / jnp.maximum(sigma, 1e-8)
        return flow.astype(xt.dtype)

    def step(
        self, model_output: jax.Array, timestep: jax.Array, sample: jax.Array,
        to_final: bool = False,
    ) -> jax.Array:
        """Euler step toward the next lower sigma (reference .step)."""
        tid = self.timestep_id(timestep)
        sigma = self.sigmas[tid]
        sigma = sigma.reshape(sigma.shape + (1,) * (sample.ndim - sigma.ndim))
        n = self.sigmas.shape[0]
        if to_final:
            sigma_next = jnp.zeros_like(sigma)
        else:
            nxt = jnp.clip(tid + 1, 0, n - 1)
            sigma_next = jnp.where(
                (tid + 1 >= n).reshape(tid.shape + (1,) * (sample.ndim - tid.ndim)),
                0.0,
                self.sigmas[nxt].reshape(sigma.shape),
            )
        out = sample.astype(jnp.float32) + model_output.astype(jnp.float32) * (
            sigma_next - sigma
        )
        return out.astype(sample.dtype)


def warp_denoising_steps(
    schedule: FlowMatchSchedule, denoising_step_list: Sequence[int]
) -> Tuple[int, ...]:
    """Map nominal step indices through the shifted schedule (reference
    `CausalInferencePipeline.__init__`: timesteps[1000 - step] with a trailing
    zero appended). Host-side."""
    ts = np.concatenate([np.asarray(schedule.timesteps), [0.0]])
    n = schedule.timesteps.shape[0]
    return tuple(float(ts[n - s]) for s in denoising_step_list)
