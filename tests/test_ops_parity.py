"""Numerical parity of core ops vs torch-CPU oracles (reference equations)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from inferix_tpu.models.schedulers.flow_match import (
    FlowMatchSchedule,
    warp_denoising_steps,
)
from inferix_tpu.ops.attention import (
    attention_chunked,
    attention_reference,
    merge_attention_partials,
)
from inferix_tpu.ops.rope import (
    apply_rope,
    build_rope_tables,
    rope_angles,
    rope_axis_split,
    sinusoidal_embedding_1d,
)

from _torch_oracles import (
    FlowMatchSchedulerOracle,
    causal_rope_apply,
    masked_attention,
    rope_params,
)


def test_rope_parity():
    head_dim, f, h, w, nh, b = 32, 2, 3, 4, 2, 1
    start_frame = 5
    c_t, c_h, c_w = rope_axis_split(head_dim)

    tables = build_rope_tables(head_dim, max_pos=64)
    x = np.random.default_rng(0).standard_normal(
        (b, f * h * w, nh, head_dim)
    ).astype(np.float32)

    ang = rope_angles(tables, f, h, w, start_frame)
    got = apply_rope(jnp.asarray(x), ang)

    ft = rope_params(64, 2 * c_t)
    fh = rope_params(64, 2 * c_h)
    fw = rope_params(64, 2 * c_w)
    want = causal_rope_apply(torch.from_numpy(x), f, h, w, ft, fh, fw,
                             start_frame=start_frame)
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-4
    )


def test_sinusoidal_embedding_parity():
    dim = 64
    pos = np.array([0.0, 1.0, 500.0, 999.0], dtype=np.float64)
    got = np.asarray(sinusoidal_embedding_1d(dim, jnp.asarray(pos)))
    half = dim // 2
    sinusoid = np.outer(pos, np.power(10000.0, -np.arange(half) / half))
    want = np.concatenate([np.cos(sinusoid), np.sin(sinusoid)], axis=1)
    # fp32 device math vs fp64 oracle: large positions (t~1000 rad) lose ~1e-3
    # in cos/sin — far below bf16 weight noise downstream, acceptable on TPU
    # where f64 is unavailable.
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=5e-3)


def test_flow_match_sigmas_parity():
    sched = FlowMatchSchedule.create(shift=8.0)
    oracle = FlowMatchSchedulerOracle(shift=8.0)
    np.testing.assert_allclose(
        np.asarray(sched.sigmas), oracle.sigmas.numpy(), rtol=1e-5, atol=1e-6
    )


def test_add_noise_parity():
    sched = FlowMatchSchedule.create(shift=8.0)
    oracle = FlowMatchSchedulerOracle(shift=8.0)
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((4, 3, 5, 5)).astype(np.float32)
    noise = rng.standard_normal((4, 3, 5, 5)).astype(np.float32)
    t = np.array([999.0, 750.0, 500.0, 31.0], dtype=np.float32)
    got = sched.add_noise(jnp.asarray(x0), jnp.asarray(noise), jnp.asarray(t))
    want = oracle.add_noise(torch.from_numpy(x0), torch.from_numpy(noise),
                            torch.from_numpy(t))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_flow_x0_roundtrip():
    sched = FlowMatchSchedule.create(shift=8.0)
    rng = np.random.default_rng(2)
    xt = jnp.asarray(rng.standard_normal((2, 3, 4, 4)).astype(np.float32))
    flow = jnp.asarray(rng.standard_normal((2, 3, 4, 4)).astype(np.float32))
    t = jnp.asarray(np.array([700.0, 300.0], dtype=np.float32))
    x0 = sched.flow_to_x0(flow, xt, t)
    flow_back = sched.x0_to_flow(x0, xt, t)
    np.testing.assert_allclose(np.asarray(flow_back), np.asarray(flow),
                               rtol=1e-3, atol=1e-3)


def test_warp_denoising_steps():
    sched = FlowMatchSchedule.create(shift=8.0)
    steps = warp_denoising_steps(sched, (1000, 750, 500, 250))
    # step 1000 maps to timesteps[0] (the max), decreasing thereafter
    assert steps[0] == float(np.asarray(sched.timesteps)[0])
    assert all(a > b for a, b in zip(steps, steps[1:]))
    assert all(0 <= s <= 1000 for s in steps)


def test_attention_parity_with_mask():
    rng = np.random.default_rng(3)
    b, sq, skv, h, d = 2, 8, 33, 4, 16
    q = rng.standard_normal((b, sq, h, d)).astype(np.float32)
    k = rng.standard_normal((b, skv, h, d)).astype(np.float32)
    v = rng.standard_normal((b, skv, h, d)).astype(np.float32)
    mask = np.arange(skv) < 17

    want = masked_attention(torch.from_numpy(q), torch.from_numpy(k),
                            torch.from_numpy(v), torch.from_numpy(mask))
    got_ref, _ = attention_reference(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), jnp.asarray(mask))
    got_chunk, _ = attention_chunked(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), jnp.asarray(mask),
                                     chunk_size=8)
    np.testing.assert_allclose(np.asarray(got_ref), want.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_chunk), want.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_attention_lse_merge():
    """Splitting KV into two halves and LSE-merging equals full attention."""
    rng = np.random.default_rng(4)
    b, sq, skv, h, d = 1, 4, 32, 2, 8
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)).astype(np.float32))

    full, _ = attention_reference(q, k, v)
    o1, l1 = attention_reference(q, k[:, :16], v[:, :16])
    o2, l2 = attention_reference(q, k[:, 16:], v[:, 16:])
    merged, _ = merge_attention_partials(
        jnp.stack([o1, o2]), jnp.stack([l1, l2])
    )
    np.testing.assert_allclose(np.asarray(merged), np.asarray(full),
                               rtol=1e-4, atol=1e-5)


def test_rope_mxu_matches_pairs():
    """The +-1-matmul rope formulation equals the interleaved-pair one."""
    from inferix_tpu.ops.rope import set_rope_impl

    tables = build_rope_tables(128, max_pos=64)
    ang = rope_angles(tables, 3, 4, 5, 7)
    x32 = np.random.default_rng(1).standard_normal((2, 60, 6, 128))
    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(x32, dt)
        ref = apply_rope(x, ang)
        try:
            set_rope_impl("mxu")
            got = apply_rope(x, ang)
        finally:
            set_rope_impl("pairs")
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=1e-6, atol=1e-6,
        )


def test_rope_mxu_batched_angles():
    """mxu rope with per-stream (batched) angle tables — the continuous
    batching path — equals the pairs formulation."""
    from inferix_tpu.ops.rope import set_rope_impl

    tables = build_rope_tables(64, max_pos=32)
    angs = jnp.stack([rope_angles(tables, 2, 2, 4, s) for s in (0, 3)])
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 16, 3, 64)),
        jnp.float32)
    ref = apply_rope(x, angs)
    try:
        set_rope_impl("mxu")
        got = apply_rope(x, angs)
    finally:
        set_rope_impl("pairs")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
