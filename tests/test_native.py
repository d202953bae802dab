"""Native components: build, ring buffer semantics, parity with numpy paths."""
import numpy as np
import pytest

from inferix_tpu.native import (
    FramePipe,
    laplacian_var,
    native_available,
    rgb_to_i420,
)


def test_native_builds():
    assert native_available(), "g++ build of frame_pipe.cpp failed"


def test_frame_pipe_fifo_and_drop():
    pipe = FramePipe(capacity=3, height=4, width=4)
    frames = [np.full((4, 4, 3), i, np.uint8) for i in range(5)]
    results = [pipe.push(f) for f in frames]
    assert results == [True, True, True, False, False]
    assert len(pipe) == 3
    assert pipe.dropped == 2
    out = [pipe.pop() for _ in range(4)]
    assert out[3] is None
    for i in range(3):
        np.testing.assert_array_equal(out[i], frames[i])
    # reusable after drain
    assert pipe.push(frames[4])
    np.testing.assert_array_equal(pipe.pop(), frames[4])


def test_rgb_to_i420_parity():
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (16, 16, 3), np.uint8)
    y, u, v = rgb_to_i420(frame)
    assert y.shape == (16, 16) and u.shape == (8, 8) and v.shape == (8, 8)
    # grey input -> Y ~ value, U/V ~ 128
    grey = np.full((8, 8, 3), 100, np.uint8)
    y2, u2, v2 = rgb_to_i420(grey)
    assert abs(int(y2[0, 0]) - 100) <= 2
    assert abs(int(u2[0, 0]) - 128) <= 2 and abs(int(v2[0, 0]) - 128) <= 2


def test_laplacian_var_parity_with_numpy():
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 256, (32, 32, 3), np.uint8)
    got = laplacian_var(frame)
    gray = (0.299 * frame[..., 0] + 0.587 * frame[..., 1]
            + 0.114 * frame[..., 2]).astype(np.float64)
    lap = (gray[:-2, 1:-1] + gray[2:, 1:-1] + gray[1:-1, :-2]
           + gray[1:-1, 2:] - 4 * gray[1:-1, 1:-1])
    assert got == pytest.approx(float(lap.var()), rel=1e-9)
    # sharp edges > flat
    flat = np.full((32, 32, 3), 50, np.uint8)
    assert laplacian_var(frame) > laplacian_var(flat)
