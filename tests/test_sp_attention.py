"""Sequence-parallel attention vs single-device oracle on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from inferix_tpu.core.config import ParallelConfig
from inferix_tpu.ops.attention import attention_reference
from inferix_tpu.parallel.mesh import make_mesh
from inferix_tpu.parallel.sp_attention import ring_attention, ulysses_attention


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(ParallelConfig(dp=1, sp=4, tp=1))


def _qkv(s=64, h=8, d=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((1, s, h, d)), jnp.float32)
    return mk(), mk(), mk()


def test_ulysses_matches_reference(mesh):
    q, k, v = _qkv()
    want, _ = attention_reference(q, k, v)
    got = ulysses_attention(mesh, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_ulysses_with_mask(mesh):
    q, k, v = _qkv(seed=1)
    mask = jnp.arange(64) < 40
    want, _ = attention_reference(q, k, v, mask)
    got = ulysses_attention(mesh, q, k, v, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_ring_matches_reference(mesh):
    q, k, v = _qkv(seed=2)
    want, _ = attention_reference(q, k, v)
    got = ring_attention(mesh, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_ring_pass_q_matches_reference(mesh):
    from inferix_tpu.parallel.sp_attention import ring_attention_pass_q

    q, k, v = _qkv(seed=3)
    want, _ = attention_reference(q, k, v)
    got = ring_attention_pass_q(mesh, q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
