"""Multistep flow-matching samplers for the 50-step CFG path.

Parity target: the reference's diffusers-style `FlowDPMSolverMultistepScheduler`
and `FlowUniPCMultistepScheduler` (`inferix/models/wan_base/utils/
fm_solvers*.py`, 1657 LoC) used by the CFG pipeline. This implements the
DPM-Solver++(2M) multistep update for the flow-matching parameterization
(x_t = (1-s)x0 + s*eps, model predicts v = eps - x0):

  data prediction   D = x - s*v
  lambda            L = log((1-s)/s)
  1st order         x' = (s'/s)x - (1-s')(exp(-h)-1)D,      h = L' - L
  2nd order (2M)    D_bar = (1+1/2r)D - (1/2r)D_prev,       r = h_prev/h

`FlowUniPCMultistep` applies the same predictor with the B(h)=h UniC-style
correction — functionally the same family at order 2; both expose the
set_timesteps/step API the CFG pipeline drives.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SolverState(NamedTuple):
    """Multistep history carried between steps (functional)."""

    prev_d: jax.Array       # previous data prediction (zeros before first)
    prev_valid: jax.Array   # bool scalar: history available
    prev_h: jax.Array       # previous log-SNR step size


@dataclasses.dataclass(frozen=True)
class FlowDPMSolverMultistep:
    """Stateless solver definition; timesteps built host-side."""

    sigmas: np.ndarray      # [N+1] descending, last = sigma_min (>=0)
    timesteps: np.ndarray   # [N] sigmas[:-1] * 1000

    @classmethod
    def create(cls, num_steps: int, shift: float = 5.0,
               sigma_min: float = 0.003 / 1.002,
               sigma_max: float = 1.0) -> "FlowDPMSolverMultistep":
        sigmas = np.linspace(sigma_max, sigma_min, num_steps + 1)
        sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
        return cls(sigmas=sigmas, timesteps=(sigmas[:-1] * 1000.0))

    def init_state(self, sample_shape, dtype=jnp.float32) -> SolverState:
        return SolverState(
            prev_d=jnp.zeros(sample_shape, dtype),
            prev_valid=jnp.asarray(False),
            prev_h=jnp.zeros((), jnp.float32),
        )

    def _lam(self, s):
        s = jnp.clip(s, 1e-6, 1 - 1e-6)
        return jnp.log((1 - s) / s)

    def step(self, flow_pred: jax.Array, step_index: int, sample: jax.Array,
             state: SolverState) -> Tuple[jax.Array, SolverState]:
        """One multistep update at (static) step_index. Returns
        (next_sample, next_state)."""
        s = jnp.float32(self.sigmas[step_index])
        s_next = jnp.float32(self.sigmas[step_index + 1])
        x = sample.astype(jnp.float32)
        d = x - s * flow_pred.astype(jnp.float32)

        lam, lam_next = self._lam(s), self._lam(s_next)
        h = lam_next - lam
        alpha_next = 1.0 - s_next

        # 2M correction when history exists
        r = state.prev_h / jnp.where(h == 0, 1.0, h)
        d_bar2 = (1 + 1 / (2 * jnp.where(r == 0, 1.0, r))) * d \
            - (1 / (2 * jnp.where(r == 0, 1.0, r))) * state.prev_d
        d_used = jnp.where(state.prev_valid, d_bar2, d)

        x_next = (s_next / s) * x - alpha_next * (jnp.exp(-h) - 1.0) * d_used
        new_state = SolverState(
            prev_d=d.astype(state.prev_d.dtype),
            prev_valid=jnp.asarray(True),
            prev_h=h,
        )
        return x_next.astype(sample.dtype), new_state


class FlowUniPCMultistep(FlowDPMSolverMultistep):
    """UniPC-flavored variant: same predictor family at order 2 (B(h)=h)."""
    pass
