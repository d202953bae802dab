"""MAGI prefix-media preprocessing: image/video -> model-resolution frames
-> prefix latents for T2V/I2V/V2V.

TPU-native counterpart of `inferix/pipeline/magi/video_process.py:208-330`
(ffmpeg_i2v / ffmpeg_v2v / encode_prefix_video). The reference shells out to
ffmpeg filters for scaling; here the geometry transforms are jax.image
resizes (run once on host, device-agnostic) and file decode is delegated to
imageio when present (same optional-dependency gating as
`core/media/video_utils.py`). Semantics mirrored exactly:

* aspect_policy "crop"  — scale so the short side covers, center-crop
  (ffmpeg `scale force_original_aspect_ratio=increase` + `crop`)
* aspect_policy "pad"   — scale so the long side fits, center-pad black
  (`scale force_original_aspect_ratio=decrease` + `pad`)
* aspect_policy "fit"   — anisotropic scale to exactly (h, w)
* v2v tail clip         — keep the LAST min(n // fps * fps, max_chunks * fps)
  frames (ffmpeg_v2v video_process.py:234-257), or the first `prefix_frame`
  frames when given.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = np.ndarray


def _resize(frames: Array, h: int, w: int) -> Array:
    """Bilinear resize [T, H0, W0, 3] float32 -> [T, h, w, 3]."""
    t, _, _, c = frames.shape
    out = jax.image.resize(jnp.asarray(frames), (t, h, w, c), "bilinear")
    return np.asarray(out)


def prepare_frames(frames: Array, h: int, w: int,
                   aspect_policy: str = "fit") -> Array:
    """uint8/float [T, H0, W0, 3] -> float32 [T, h, w, 3] in [-1, 1]."""
    if frames.ndim == 3:
        frames = frames[None]
    f = frames.astype(np.float32)
    if frames.dtype == np.uint8:
        f = f / 127.5 - 1.0
    t, h0, w0, _ = f.shape
    if aspect_policy == "crop":
        s = max(h / h0, w / w0)
        hs, ws = max(h, int(round(h0 * s))), max(w, int(round(w0 * s)))
        f = _resize(f, hs, ws)
        y0, x0 = (hs - h) // 2, (ws - w) // 2
        f = f[:, y0:y0 + h, x0:x0 + w]
    elif aspect_policy == "pad":
        s = min(h / h0, w / w0)
        hs, ws = min(h, int(round(h0 * s))), min(w, int(round(w0 * s)))
        f = _resize(f, hs, ws)
        out = np.full((t, h, w, 3), -1.0, np.float32)  # black in [-1, 1]
        y0, x0 = (h - hs) // 2, (w - ws) // 2
        out[:, y0:y0 + hs, x0:x0 + ws] = f
        f = out
    else:  # "fit" (and the reference's unknown-policy fallback)
        f = _resize(f, h, w)
    return f


def clip_prefix_video(frames: Array, fps: int,
                      prefix_frame: Optional[int] = None,
                      max_chunks: int = 5) -> Array:
    """Reference ffmpeg_v2v frame-count policy (video_process.py:247-257)."""
    if prefix_frame is not None:
        return frames[:prefix_frame]
    n = frames.shape[0]
    if n < fps:
        clip_len = 1
    else:
        clip_len = min(n // fps * fps, max_chunks * fps)
    return frames[-clip_len:]


def process_image(image: Array, h: int, w: int,
                  aspect_policy: str = "fit") -> Array:
    """Single image [H0, W0, 3] -> [1, h, w, 3] prefix frames (ffmpeg_i2v)."""
    return prepare_frames(image[None] if image.ndim == 3 else image,
                          h, w, aspect_policy)[:1]


def process_prefix_video(frames: Array, fps: int, h: int, w: int,
                         prefix_frame: Optional[int] = None,
                         max_chunks: int = 5,
                         aspect_policy: str = "fit") -> Array:
    """Video frames [T, H0, W0, 3] -> clipped + resized prefix frames."""
    frames = clip_prefix_video(frames, fps, prefix_frame, max_chunks)
    return prepare_frames(frames, h, w, aspect_policy)


def load_media(path: str) -> Array:
    """Decode an image or video file to [T, H, W, 3] uint8 (imageio)."""
    try:
        import imageio
    except ImportError as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "imageio is required to decode media files; pass decoded numpy "
            "frames to process_image/process_prefix_video instead") from e
    if path.lower().endswith((".png", ".jpg", ".jpeg", ".webp", ".bmp")):
        return np.asarray(imageio.imread(path))[None, ..., :3]
    reader = imageio.get_reader(path)
    return np.stack([np.asarray(fr)[..., :3] for fr in reader])


def encode_prefix_latents(vae, frames: Array,
                          chunk_width: Optional[int] = None) -> jax.Array:
    """Prefix frames [T, h, w, 3] in [-1, 1] -> latents [1, F0, H', W', z]
    via the ViT-VAE; pads T up to a whole number of latent chunks by
    repeating the last frame when chunk_width is given (the MAGI walk
    consumes whole chunks — video_generate.py:92-95 floors instead; padding
    keeps every supplied frame)."""
    t = frames.shape[0]
    pl = vae.cfg.patch_length
    lat_t = -(-t // pl)
    if chunk_width is not None:
        lat_t = -(-lat_t // chunk_width) * chunk_width
    need = lat_t * pl
    if need > t:
        frames = np.concatenate(
            [frames, np.repeat(frames[-1:], need - t, axis=0)])
    return vae.encode(jnp.asarray(frames, jnp.float32)[None])
