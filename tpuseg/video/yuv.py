"""YUV420 (I420) frame transport: 2.25x fewer bytes over the host->device
link, reconstructed to RGB on device.

Why: real-video end-to-end serving on a tunneled/remote chip is H2D-bound
(the dev relay moves ~45-65 MB/s once a real executable has run —
docs/PERF_NOTES.md).  Frames already ship at decode resolution (device-side
resize); the remaining lever on the wire is chroma subsampling: planar
YUV420 carries 1.5 bytes/px instead of 3, which is ALSO the native output
format of every video decoder — a production pipeline would skip the
host-side RGB trip entirely and ship the decoder's own planes.  Here the
host converts RGB->I420 (cv2 decodes to RGB; one vectorized numpy pass)
and the device program inverts it before the stem.

Numerics: full-range BT.601 (the JPEG/JFIF matrix), exactly inverse pairs
on both sides, with 2x2 box-mean chroma subsampling and nearest chroma
upsampling on device.  Luma is preserved to rounding; chroma detail within
2x2 blocks is lost — that is the 2.25x.  Measure the effect on YOUR video
with seg_video --transport yuv420 --temporal-report-style agreement
(shapes-world measurement: ids agreement >99% — see tests/test_yuv.py).

Plane packing, chosen to keep full lane occupancy on device (the layout
tax, docs/PERF_NOTES.md): one (B, H*3/2, W) uint8 array — rows [0, H) are
Y; rows [H, H+H/4) hold the (H/2, W/2) U plane row-major (two chroma rows
per storage row); the last H/4 rows hold V the same way.  This is exactly
libavcodec's contiguous I420 buffer viewed as W-wide rows.  Requires
H % 4 == 0 and W % 2 == 0 (every codec's macroblock sizes already are).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rgb_to_i420(frames: np.ndarray) -> np.ndarray:
    """Host side: (B, H, W, 3) uint8 RGB -> (B, H*3/2, W) uint8 planar I420.

    Full-range BT.601 forward matrix (JPEG):
      Y =  0.299 R + 0.587 G + 0.114 B
      U = -0.168736 R - 0.331264 G + 0.5 B + 128
      V =  0.5 R - 0.418688 G - 0.081312 B + 128
    Chroma is 2x2 box-mean subsampled.
    """
    frames = np.asarray(frames)
    if frames.ndim == 3:
        frames = frames[None]
    b, h, w, _ = frames.shape
    assert h % 4 == 0 and w % 2 == 0, (
        f"I420 packing needs H%4==0 and W%2==0, got {h}x{w}"
    )
    f = frames.astype(np.float32)
    r, g, bl = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * bl
    u = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
    # 2x2 box-mean subsample
    u = u.reshape(b, h // 2, 2, w // 2, 2).mean((2, 4))
    v = v.reshape(b, h // 2, 2, w // 2, 2).mean((2, 4))
    out = np.empty((b, h * 3 // 2, w), np.uint8)
    out[:, :h] = np.clip(np.round(y), 0, 255).astype(np.uint8)
    out[:, h : h + h // 4] = (
        np.clip(np.round(u), 0, 255).astype(np.uint8).reshape(b, h // 4, w)
    )
    out[:, h + h // 4 :] = (
        np.clip(np.round(v), 0, 255).astype(np.uint8).reshape(b, h // 4, w)
    )
    return out


def i420_geometry(rows: int) -> int:
    """Decode height H from the packed row count H*3/2."""
    assert rows % 3 == 0, f"not an I420 row count: {rows}"
    return rows * 2 // 3


def i420_to_rgb_flat(x: jax.Array) -> jax.Array:
    """Device side: (B, H*3/2, W) uint8 I420 -> FLAT (B, H, W*3) uint8 RGB.

    Inverse of :func:`rgb_to_i420` (full-range BT.601):
      R = Y + 1.402 (V-128)
      G = Y - 0.344136 (U-128) - 0.714136 (V-128)
      B = Y + 1.772 (U-128)
    Chroma upsamples nearest (2x2 repeat).  Runs at DECODE resolution —
    ~0.4 MB of traffic per 640x360 frame, trivial next to a forward.
    """
    b, rows, w = x.shape
    h = i420_geometry(rows)
    y = x[:, :h, :].astype(jnp.float32)
    u = x[:, h : h + h // 4, :].reshape(b, h // 2, w // 2).astype(jnp.float32)
    v = x[:, h + h // 4 :, :].reshape(b, h // 2, w // 2).astype(jnp.float32)
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2) - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    bl = y + 1.772 * u
    rgb = jnp.stack([r, g, bl], axis=-1)
    rgb = jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)
    return rgb.reshape(b, h, w * 3)
