"""Disaggregated serving: PER_BLOCK VAE decode on dedicated decode devices.

On ONE chip, TRUE_STREAMING's interleaved generate+decode serializes — a
v5e core executes one program at a time, so interleaved wall = gen + decode
exactly (measured: BASELINE.md round-5, parts-sum matches wall within 2%).
The multi-chip fix is DISAGGREGATION: the generator owns a submesh, the VAE
decoder owns the remaining devices, and because JAX dispatch is async the
decode program for block i executes on the decode devices WHILE the denoise
program for block i+1 runs on the generator submesh. Steady-state block
latency then approaches max(gen, decode) instead of gen + decode
(single-chip HEAD: 0.80 s gen + 0.73/0.44 s decode — a one-decode-chip
disaggregated pair runs at the gen rate, ~12/0.80 = 15 pixel f/s class).

Reference analog: the tile-parallel VAE distribution
(`inferix/distributed/parallelism/tile_parallel.py:27-448`) splits frames
into overlapping spatial tiles across workers and blends the borders; the
reference never overlaps decode with generation (its TRUE_STREAMING decodes
on the same GPU between blocks, `pipeline/base_pipeline.py:747-934`). This
module does both: spatial tiles fan out across the decode devices (one
temporal-conv cache per tile, linear-ramp seam blending as the reference)
and the whole decode tree runs asynchronously with respect to the
generator's next dispatch.

Design notes (TPU):
  * Each tile's params/cache/latents are COMMITTED to its decode device, so
    the jitted decode program runs there without any annotation plumbing —
    placement-follows-inputs is the whole routing mechanism.
  * Tiles split the latent W axis with `overlap` latent columns of halo on
    interior edges (8x that in pixels). Interior tiles share one geometry,
    so all interior tiles share one compiled program per (first, steady)
    phase.
  * `decode_block` returns a `PixelTiles` handle: per-tile pixel arrays
    still resident on their decode devices. Nothing blocks — the consumer
    calls `.assemble()` (host blend, production: PCIe reads) or keeps the
    handles on-device. The generator's next block dispatch is therefore
    never gated on decode execution.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Cache = Any


def _split_w(w: int, tiles: int, overlap: int) -> List[Tuple[int, int, int, int]]:
    """Split latent width into `tiles` slices with `overlap` halo columns on
    interior edges. Returns (w0, w1, keep0, keep1): [w0:w1] is the decoded
    slice, [keep0:keep1] (slice-relative) is the owned region; the rest is
    blended seam."""
    assert tiles >= 1 and w >= tiles
    base = [w * i // tiles for i in range(tiles + 1)]
    out = []
    for i in range(tiles):
        lo, hi = base[i], base[i + 1]
        w0 = max(0, lo - (overlap if i > 0 else 0))
        w1 = min(w, hi + (overlap if i < tiles - 1 else 0))
        out.append((w0, w1, lo - w0, hi - w0))
    return out


@dataclasses.dataclass
class PixelTiles:
    """Per-tile pixel handles (device-resident) + seam geometry.

    `tiles[i]` is [B, T_px, H_px, w_px_i, 3] on decode device i. `assemble`
    blends interior seams with a linear ramp over the pixel overlap (the
    reference's blend_h, `tile_parallel.py:230-252`) and returns one host
    array — the only point anything leaves the decode devices."""
    tiles: List[jax.Array]
    spans: List[Tuple[int, int, int, int]]  # latent (w0, w1, keep0, keep1)
    scale: int = 8

    @property
    def shape(self) -> Tuple[int, ...]:
        """Assembled pixel shape [B, T_px, H_px, W_px, C] — array-like so
        existing stream callbacks (frame counting) work unchanged."""
        b, tpx, hpx, _, c = self.tiles[0].shape
        return (b, tpx, hpx, self.spans[-1][1] * self.scale, c)

    def block_until_ready(self) -> "PixelTiles":
        for t in self.tiles:
            t.block_until_ready()
        return self

    def assemble(self) -> np.ndarray:
        s = self.scale
        n = len(self.tiles)
        if n == 1:
            return np.asarray(self.tiles[0])
        b, tpx, hpx, _, c = self.tiles[0].shape
        w_px = self.spans[-1][1] * s  # last tile's w1 == full latent width
        out = np.zeros((b, tpx, hpx, w_px, c), np.asarray(self.tiles[0]).dtype)
        for i, (tile, (w0, w1, k0, k1)) in enumerate(zip(self.tiles, self.spans)):
            res = np.asarray(tile)
            ov = k0 * s  # pixel overlap on the left edge
            if i > 0 and ov > 0:
                ramp = np.linspace(0.0, 1.0, ov + 2)[1:-1].reshape(1, 1, 1, ov, 1)
                left = w0 * s
                out[:, :, :, left:left + ov] = (
                    out[:, :, :, left:left + ov] * (1 - ramp)
                    + res[:, :, :, :ov] * ramp)
                out[:, :, :, left + ov:w0 * s + res.shape[3]] = res[:, :, :, ov:]
            else:
                out[:, :, :, w0 * s:w0 * s + res.shape[3]] = res
        return out


# pytree registration: jax.block_until_ready / tree.map over PixelTiles
# work out of the box (tiles are the children; seam geometry is static)
jax.tree_util.register_pytree_node(
    PixelTiles,
    lambda p: (tuple(p.tiles), (tuple(p.spans), p.scale)),
    lambda aux, tiles: PixelTiles(list(tiles), list(aux[0]), aux[1]),
)


class DisaggregatedVAEDecoder:
    """Routes streaming block decode to dedicated decode devices.

    vae: a `CausalVAE` (its jitted `_decode_chunk_impl` is reused — one
    program per tile geometry x {first, steady}). devices: the decode
    devices; tiles defaults to len(devices) (tile i pinned to device
    i % len(devices)). overlap: halo width in LATENT columns on interior
    tile edges (pixels blend over 8x that).

    Matches the `decode_chunk(z, cache, first) -> (pixels, cache)` shape of
    `CausalVAE` so `SelfForcingPipeline`'s TRUE_STREAMING block hook can
    swap it in; pixels come back as `PixelTiles` (post-processed to [0, 1]
    on-device) and `cache` is the per-tile cache list."""

    def __init__(self, vae, devices: Sequence[jax.Device],
                 tiles: Optional[int] = None, overlap: int = 2):
        self.vae = vae
        self.devices = list(devices)
        self.tiles = int(tiles) if tiles else len(self.devices)
        self.overlap = overlap
        assert self.tiles >= 1 and self.devices
        # one committed param replica per distinct decode device in use
        self._dev_for_tile = [self.devices[i % len(self.devices)]
                              for i in range(self.tiles)]
        self._params = {}
        for d in set(self._dev_for_tile):
            self._params[d] = jax.device_put(vae.params, d)
        self.scale = vae.cfg.spatial_factor

    def decode_chunk(self, z: jax.Array, cache: Optional[List[Cache]],
                     first: bool) -> Tuple[PixelTiles, List[Cache]]:
        """z: [B, T, h, w, zdim] (generator layout). Returns device-resident
        `PixelTiles` in [0, 1] plus the per-tile temporal-conv caches."""
        w = z.shape[3]
        spans = _split_w(w, self.tiles, self.overlap)
        outs: List[jax.Array] = []
        new_caches: List[Cache] = []
        for i, (w0, w1, k0, k1) in enumerate(spans):
            dev = self._dev_for_tile[i]
            zi = jax.device_put(z[:, :, :, w0:w1], dev)
            ci = cache[i] if cache is not None else None
            out, ci = self.vae._decode_first(self._params[dev], zi, ci,
                                             first=first)
            outs.append(jnp.clip(out, -1.0, 1.0) * 0.5 + 0.5)
            new_caches.append(ci)
        return PixelTiles(outs, spans, self.scale), new_caches
