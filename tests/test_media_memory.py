"""Media backends (memory/file) and the component memory manager."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inferix_tpu.core.media.streaming_backend import (
    MemoryQueueBackend,
    create_streaming_backend,
    latents_to_uint8,
)
from inferix_tpu.core.media.video_utils import (
    FileStreamingBackend,
    load_video,
    save_video,
)
from inferix_tpu.core.memory import AsyncMemoryManager


def test_memory_backend_queue():
    b = create_streaming_backend("memory")
    with b:
        frames = np.zeros((3, 8, 8, 3), np.uint8)
        b.stream_batch(frames)
        assert b.frames_streamed == 3
        assert b.queue.qsize() == 3
    assert not b.connected


def test_latents_to_uint8():
    v = np.linspace(0, 1, 2 * 2 * 2 * 3).reshape(1, 2, 2, 2, 3)
    u = latents_to_uint8(v)
    assert u.dtype == np.uint8 and u.shape == (2, 2, 2, 3)
    assert u.max() == 255 and u.min() == 0


def test_file_backend_roundtrip(tmp_path):
    path = str(tmp_path / "out.npz")
    b = FileStreamingBackend(path=path, fps=8)
    with b:
        b.stream_batch(np.full((2, 4, 4, 3), 7, np.uint8))
        b.stream_batch(np.full((1, 4, 4, 3), 9, np.uint8))
    frames = load_video(b.path)
    assert frames.shape == (3, 4, 4, 3)
    assert frames[0, 0, 0, 0] == 7 and frames[2, 0, 0, 0] == 9


def test_gradio_backend_raises_without_gradio():
    b = create_streaming_backend("gradio")
    with pytest.raises(RuntimeError, match="gradio"):
        b.connect()


def test_memory_manager_budget_lru():
    mb = 1024 * 1024
    mgr = AsyncMemoryManager(budget_bytes=3 * mb)
    a = jnp.zeros((mb // 4,), jnp.float32)  # 1 MB
    b = jnp.zeros((mb // 4,), jnp.float32)
    c = jnp.zeros((mb // 4,), jnp.float32)
    mgr.register("a", a)
    mgr.register("b", b)
    mgr.register("c", c)
    assert mgr.device_bytes() == 3 * mb

    big = jnp.zeros((mb // 2,), jnp.float32)  # 2 MB
    mgr.register("big", big)
    with mgr.use("big") as t:
        assert t.shape == big.shape
    # budget 3 MB: two 1MB components must have been evicted
    assert mgr.device_bytes() <= 3 * mb

    with mgr.exclusive("a") as t:
        resident = [n for n, comp in mgr._components.items() if comp.on_device]
        assert resident == ["a"]
    # values survive the round trip
    np.testing.assert_array_equal(np.asarray(mgr.get("big")), np.asarray(big))


def test_streaming_backend_factory_all_names():
    """Every factory name resolves: memory/file always construct; the
    optional-dependency backends (gradio/webrtc/rtmp) either construct or
    fail with a clear unavailability error — never an unknown-name error."""
    import numpy as np
    import pytest

    from inferix_tpu.core.media.streaming_backend import (
        create_streaming_backend, latents_to_uint8)

    mem = create_streaming_backend("memory")
    mem.connect()
    mem.stream_batch(np.zeros((2, 4, 4, 3), np.uint8))
    assert mem.frames_streamed == 2
    mem.disconnect()

    for name in ("gradio", "webrtc", "rtmp"):
        try:
            b = create_streaming_backend(name)
        except (ImportError, RuntimeError) as e:
            assert name in str(e).lower() or "not found" in str(e).lower() \
                or "unavailable" in str(e).lower(), (name, e)
        else:
            assert hasattr(b, "connect") and hasattr(b, "stream_batch")

    with pytest.raises(ValueError, match="unknown streaming backend"):
        create_streaming_backend("nope")

    u8 = latents_to_uint8(np.full((1, 2, 4, 4, 3), 0.5, np.float32))
    assert u8.dtype == np.uint8 and u8.shape == (2, 4, 4, 3)
    assert int(u8[0, 0, 0, 0]) in (127, 128)
