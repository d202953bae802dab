"""Optical-flow + MUSIQ-style metric plug-ins (VERDICT round-1 item 9)."""
import numpy as np
import pytest

from inferix_tpu.eval.flow_metrics import (
    lucas_kanade_flow,
    musiq_style_clarity,
    optical_flow_dynamic_degree,
    optical_flow_motion_smoothness,
    register_flow_metrics,
)


def _texture(h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((h, w))
    # smooth it so gradients are informative
    for _ in range(2):
        base = 0.25 * (np.roll(base, 1, 0) + np.roll(base, -1, 0)
                       + np.roll(base, 1, 1) + np.roll(base, -1, 1))
    img = (base - base.min()) / (np.ptp(base) + 1e-8)
    return np.repeat(img[..., None], 3, axis=-1)


def _shift(img, dx, dy):
    return np.roll(np.roll(img, dy, axis=0), dx, axis=1)


def test_lk_flow_recovers_translation():
    a = _texture()
    b = _shift(a, 3, 1)
    u, v = lucas_kanade_flow(a, b)
    # interior estimate (borders wrap) ~ (+3, +1)
    ui = u[16:-16, 16:-16].mean()
    vi = v[16:-16, 16:-16].mean()
    assert abs(ui - 3.0) < 0.7, ui
    assert abs(vi - 1.0) < 0.7, vi


def test_dynamic_degree_tracks_motion_magnitude():
    a = _texture()
    slow = np.stack([_shift(a, i, 0) for i in range(4)])
    fast = np.stack([_shift(a, 3 * i, 0) for i in range(4)])
    d_slow = optical_flow_dynamic_degree(slow)
    d_fast = optical_flow_dynamic_degree(fast)
    assert d_fast > 1.5 * d_slow, (d_slow, d_fast)


def test_motion_smoothness_prefers_smooth_motion():
    a = _texture()
    # constant-velocity motion (smooth) vs jittery (direction flips)
    smooth = np.stack([_shift(a, 2 * i, 0) for i in range(5)])
    rng = np.random.default_rng(1)
    jitter_frames = [a]
    pos = 0
    for i in range(4):
        pos += int(rng.integers(-3, 4))
        f = _shift(a, pos, 0) + 0.1 * rng.standard_normal(a.shape)
        jitter_frames.append(np.clip(f, 0, 1))
    jitter = np.stack(jitter_frames)
    s_smooth = optical_flow_motion_smoothness(smooth)
    s_jitter = optical_flow_motion_smoothness(jitter)
    assert s_smooth > s_jitter, (s_smooth, s_jitter)
    # fast-but-smooth motion is NOT penalized like a raw 2nd difference
    assert s_smooth > 0.4


def test_clarity_ranks_sharp_over_blurred():
    sharp = np.stack([_texture(seed=i) for i in range(3)])
    # box-blur the frames
    def blur(f):
        g = f.copy()
        for _ in range(6):
            g = 0.25 * (np.roll(g, 1, 0) + np.roll(g, -1, 0)
                        + np.roll(g, 1, 1) + np.roll(g, -1, 1))
        return g
    blurred = np.stack([blur(f) for f in sharp])
    c_sharp = musiq_style_clarity(sharp)
    c_blur = musiq_style_clarity(blurred)
    assert 0 <= c_blur < c_sharp <= 100, (c_sharp, c_blur)


def test_registration_into_vde():
    from inferix_tpu.eval import vde as vde_mod

    register_flow_metrics()
    assert "clarity_musiq" in vde_mod.BUILTIN_METRICS
    assert "motion_flow" in vde_mod.BUILTIN_METRICS
    assert "dynamic_flow" in vde_mod.BUILTIN_METRICS
    video = np.stack([_shift(_texture(), i, 0) for i in range(8)])
    res = vde_mod.evaluate_video(video, n_chunks=2,
                                 metrics=["dynamic_flow"])
    assert np.isfinite(res["dynamic_flow"])
