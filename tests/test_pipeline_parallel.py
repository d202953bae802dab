"""Pipeline-parallel layer scan vs single-device reference."""
import jax
import jax.numpy as jnp
import numpy as np

from inferix_tpu.core.config import ParallelConfig
from inferix_tpu.parallel.mesh import make_mesh
from inferix_tpu.parallel.pipeline_parallel import pp_scan_layers


def test_pp_scan_matches_sequential():
    mesh = make_mesh(ParallelConfig(dp=1, sp=1, tp=1, pp=4))
    L, d = 8, 16
    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.standard_normal((L, d, d)) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.standard_normal((L, d)) * 0.1, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((2, d)), jnp.float32)

    def layer_fn(p, h):
        return jnp.tanh(h @ p["w"] + p["b"])

    want = x
    for i in range(L):
        want = layer_fn({"w": params["w"][i], "b": params["b"][i]}, want)

    got = pp_scan_layers(mesh, layer_fn, params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
