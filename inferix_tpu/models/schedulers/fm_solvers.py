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

`FlowUniPCMultistep` is the full UniPC predictor-corrector
(`fm_solvers_unipc.py:350-628` multistep_uni_p_bh_update /
multistep_uni_c_bh_update, B(h)=e^h-1 "bh2" variant, predict_x0): each step
first CORRECTS the incoming sample using the fresh model output at x_t plus
the multistep history (UniC), then PREDICTS x_{t-1} (UniP). Because the CFG
loop drives steps with a static Python index, all scalar coefficients
(lambdas, h, rks, rhos from the Vandermonde solve) are computed host-side in
float64; only the tensor combinations are traced.
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


class UniPCState(NamedTuple):
    """Multistep history for UniPC (functional).

    m_hist holds the last `solver_order` converted model outputs (x0
    predictions), newest last; entries older than the current step index are
    zeros and never referenced (validity is static: step i has min(i+1,
    order) real entries). last_sample is the pre-predictor sample of the
    previous step (the corrector's x_{t-1})."""

    m_hist: jax.Array      # [order, *sample_shape]
    last_sample: jax.Array


def _unipc_coeffs(hh: float, rks: np.ndarray, order: int, variant: str):
    """Host-side UniPC B(h) coefficients (reference
    fm_solvers_unipc.py:434-463): R Vandermonde in rks, b from the phi-k
    recursion. Returns (R, b) float64."""
    h_phi_1 = np.expm1(hh)
    h_phi_k = h_phi_1 / hh - 1
    b_h = hh if variant == "bh1" else np.expm1(hh)
    R, b = [], []
    factorial_i = 1.0
    for i in range(1, order + 1):
        R.append(np.power(rks, i - 1))
        b.append(h_phi_k * factorial_i / b_h)
        factorial_i *= i + 1
        h_phi_k = h_phi_k / hh - 1 / factorial_i
    return np.stack(R), np.asarray(b)


@dataclasses.dataclass(frozen=True)
class FlowUniPCMultistep:
    """UniPC multistep predictor-corrector for flow matching.

    Reference: `inferix/models/wan_base/utils/fm_solvers_unipc.py:77-739`
    (FlowUniPCMultistepScheduler with the defaults the CFG pipeline uses:
    solver_order=2, predict_x0=True, solver_type="bh2", lower_order_final=
    True, final_sigmas_type="zero"). Same step API as
    FlowDPMSolverMultistep so the CFG pipeline can select either.
    """

    sigmas: np.ndarray      # [N+1] descending, last = 0
    timesteps: np.ndarray   # [N]
    solver_order: int = 2
    solver_type: str = "bh2"

    @classmethod
    def create(cls, num_steps: int, shift: float = 5.0,
               solver_order: int = 2,
               solver_type: str = "bh2") -> "FlowUniPCMultistep":
        # reference set_timesteps: linspace over [sigma_max=1-1/1000, 0),
        # shifted, with a final appended sigma of exactly 0
        sigma_max = 1.0 - 1.0 / 1000.0
        sigmas = np.linspace(sigma_max, 0.0, num_steps + 1)[:-1]
        sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
        timesteps = sigmas * 1000.0
        sigmas = np.concatenate([sigmas, [0.0]])
        return cls(sigmas=sigmas, timesteps=timesteps,
                   solver_order=solver_order, solver_type=solver_type)

    def init_state(self, sample_shape, dtype=jnp.float32) -> UniPCState:
        return UniPCState(
            m_hist=jnp.zeros((self.solver_order,) + tuple(sample_shape),
                             dtype),
            last_sample=jnp.zeros(sample_shape, dtype),
        )

    # -- static per-step scalar schedule --------------------------------------

    def _lambda(self, i: int) -> float:
        s = float(self.sigmas[i])
        with np.errstate(divide="ignore"):
            return float(np.log(1.0 - s) - np.log(s))

    def _order_pred(self, i: int) -> int:
        # lower_order_final + multistep warmup (reference step(), :712-722)
        n = len(self.timesteps)
        return max(1, min(self.solver_order, n - i, i + 1))

    def step(self, flow_pred: jax.Array, step_index: int, sample: jax.Array,
             state: UniPCState) -> Tuple[jax.Array, UniPCState]:
        """UniC-then-UniP update at (static) step_index."""
        i = int(step_index)
        x = sample.astype(jnp.float32)
        sigma_i = float(self.sigmas[i])
        # convert_model_output (flow prediction, predict_x0): x0 = x - s*v
        m_t = x - sigma_i * flow_pred.astype(jnp.float32)

        hist = state.m_hist.astype(jnp.float32)

        # ---- corrector (UniC) on the incoming sample ----
        if i > 0:
            c_order = self._order_pred(i - 1)
            lam_t, lam_s0 = self._lambda(i), self._lambda(i - 1)
            h = lam_t - lam_s0
            rks, d1s = [], []
            for j in range(1, c_order):
                lam_sj = self._lambda(i - (j + 1))
                rk = (lam_sj - lam_s0) / h
                rks.append(rk)
                mj = hist[-(j + 1)]
                d1s.append((mj - hist[-1]) / rk)
            rks.append(1.0)
            hh = -h  # predict_x0
            if c_order == 1:
                rhos_c = np.asarray([0.5])
            else:
                R, b = _unipc_coeffs(hh, np.asarray(rks), c_order,
                                     self.solver_type)
                rhos_c = np.linalg.solve(R, b)
            h_phi_1 = float(np.expm1(hh))
            b_h = float(hh if self.solver_type == "bh1" else np.expm1(hh))
            alpha_t = 1.0 - sigma_i
            sigma_s0 = float(self.sigmas[i - 1])
            x_t_ = (sigma_i / sigma_s0) * state.last_sample.astype(jnp.float32) \
                - alpha_t * h_phi_1 * hist[-1]
            corr_res = sum(float(rhos_c[j]) * d1s[j]
                           for j in range(len(d1s))) if d1s else 0.0
            d1_t = m_t - hist[-1]
            x = x_t_ - alpha_t * b_h * (corr_res + float(rhos_c[-1]) * d1_t)

        # ---- push history ----
        hist = jnp.concatenate([hist[1:], m_t[None]], axis=0)

        # ---- predictor (UniP) ----
        p_order = self._order_pred(i)
        sigma_next = float(self.sigmas[i + 1])
        lam_next, lam_i = self._lambda(i + 1), self._lambda(i)
        h = lam_next - lam_i
        rks, d1s = [], []
        for j in range(1, p_order):
            lam_sj = self._lambda(i - j)
            rk = (lam_sj - lam_i) / h
            rks.append(rk)
            mj = hist[-(j + 1)]
            d1s.append((mj - hist[-1]) / rk)
        hh = -h
        h_phi_1 = float(np.expm1(hh))
        b_h = float(hh if self.solver_type == "bh1" else np.expm1(hh))
        alpha_next = 1.0 - sigma_next
        if d1s:
            if p_order == 2:
                rhos_p = np.asarray([0.5])
            else:
                rks_full = np.asarray(rks + [1.0])
                R, b = _unipc_coeffs(hh, rks_full, p_order, self.solver_type)
                rhos_p = np.linalg.solve(R[:-1, :-1], b[:-1])
            pred_res = sum(float(rhos_p[j]) * d1s[j] for j in range(len(d1s)))
        else:
            pred_res = 0.0
        ratio = (sigma_next / sigma_i) if sigma_i > 0 else 0.0
        x_next = ratio * x - alpha_next * h_phi_1 * hist[-1] \
            - alpha_next * b_h * pred_res

        new_state = UniPCState(
            m_hist=hist.astype(state.m_hist.dtype),
            last_sample=x.astype(state.last_sample.dtype),
        )
        return x_next.astype(sample.dtype), new_state
