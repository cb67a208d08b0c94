"""Bit-packing for class-id maps: shrink the D2H fetch on slow host links.

The ids-only serving path fetches one uint8 per pixel, and on a
remote-dispatch link that fetch IS the end-to-end bottleneck: the tunneled
dev chip moves ~45 MB/s D2H, so 2 MB/frame of 1024x2048 ids caps the real-
video rate at ~23 fps while the device computes 112+ (docs/PERF_NOTES.md,
"Real-video end-to-end").  But a 19-class id needs 5 bits, not 8: packing
on device cuts the bytes 8/bits-fold (1.6x for Cityscapes' 19 classes, 2x
for <=16-class heads) and the host unpack is a handful of vectorized
numpy shifts.  EXACT — pack/unpack round-trips bit-identically (tested),
unlike the lossy levers (temporal reuse, yuv420 chroma subsampling).

Layout: pixels are packed in groups of 8 along the last (width) axis,
little-endian within the group — pixel ``i`` of a group occupies bits
``[bits*i, bits*(i+1))`` of the group's ``bits`` bytes.  A (B, H, W) id
map packs to (B, H, W // 8 * bits) uint8; W must be a multiple of 8 (every
tpuseg serving resolution is — the model's /8 feature grid already wants
that).

The device side is ~3*bits shift/or ops on a (B, H, W/8) tensor — VPU
noise next to a forward.  Reference counterpart: none (the reference's
torch pipeline fetches raw full-resolution `pred` tensors over PCIe,
seg_video.py:238-247, and never needs this); a tpuseg-native transport
optimization for remote-attached chips.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pack_ids", "unpack_ids", "packed_width"]


def _spans(bits: int):
    """(i, j, shift) triples: pixel i's contribution to packed byte j.

    shift >= 0 means ``byte_j |= v_i << shift`` (uint8 wrap drops the bits
    that belong to the NEXT byte); shift < 0 means ``byte_j |= v_i >> -shift``
    (the pixel's high bits continuing from the previous byte).
    """
    out = []
    for j in range(bits):
        for i in range(8):
            lo, hi = bits * i, bits * i + bits
            if hi <= 8 * j or lo >= 8 * j + 8:
                continue
            out.append((i, j, lo - 8 * j))
    return out


def packed_width(w: int, bits: int) -> int:
    assert w % 8 == 0, f"width {w} must be a multiple of 8 to pack ids"
    return w // 8 * bits


def pack_ids(ids, bits: int):
    """Device-side: (..., W) uint8 ids < 2**bits -> (..., W//8*bits) uint8.

    jax-traceable (elementwise shifts/ors only — safe inside any jitted
    serving program, including under a lax.scan).
    """
    import jax.numpy as jnp

    assert 1 <= bits <= 8, bits
    if bits == 8:
        return ids
    w = ids.shape[-1]
    assert w % 8 == 0, f"width {w} must be a multiple of 8 to pack ids"
    g = ids.reshape(ids.shape[:-1] + (w // 8, 8))
    bytes_ = [jnp.zeros(g.shape[:-1], jnp.uint8) for _ in range(bits)]
    for i, j, sh in _spans(bits):
        v = g[..., i]
        contrib = (v << sh) if sh >= 0 else (v >> -sh)
        bytes_[j] = bytes_[j] | contrib
    packed = jnp.stack(bytes_, axis=-1)
    return packed.reshape(ids.shape[:-1] + (w // 8 * bits,))


def unpack_ids(packed: np.ndarray, bits: int) -> np.ndarray:
    """Host-side inverse: (..., W//8*bits) uint8 -> (..., W) uint8 ids.

    Pure vectorized numpy; ~1 ms per 2 MB frame, overlapped with the next
    batch's D2H in the pipeline.
    """
    assert 1 <= bits <= 8, bits
    if bits == 8:
        return packed
    wp = packed.shape[-1]
    assert wp % bits == 0, (wp, bits)
    g = packed.reshape(packed.shape[:-1] + (wp // bits, bits))
    mask = np.uint8((1 << bits) - 1)
    pix = []
    by_i: dict[int, list] = {}
    for i, j, sh in _spans(bits):
        by_i.setdefault(i, []).append((j, sh))
    for i in range(8):
        v = np.zeros(g.shape[:-1], np.uint8)
        for j, sh in by_i[i]:
            b = g[..., j]
            # inverse of pack: byte got (v << sh) -> recover with >> sh;
            # uint8 wrap on the <<-side loses only bits >= 8, which the
            # final mask discards anyway
            v = v | ((b >> sh) if sh >= 0 else (b << -sh))
        pix.append(v & mask)
    out = np.stack(pix, axis=-1)
    return out.reshape(packed.shape[:-1] + (wp // bits * 8,))
