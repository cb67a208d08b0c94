"""YUV420 transport (tpuseg.video.yuv + VideoSegmenter transport
parameter): exact-inverse conversion pair, and end-to-end serving parity
with the rgb transport."""

import numpy as np
import pytest

from tpuseg.video.yuv import i420_to_rgb_flat, rgb_to_i420


def test_roundtrip_close_and_luma_exact():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (2, 32, 48, 3), np.uint8)
    packed = rgb_to_i420(frames)
    assert packed.shape == (2, 48, 48)  # H*3/2 rows
    back = np.asarray(i420_to_rgb_flat(packed)).reshape(2, 32, 48, 3)
    # random chroma is the worst case for 2x2 subsampling; luma must
    # survive to rounding.  BT.601: Y is the same weighted sum both sides.
    y_src = (0.299 * frames[..., 0] + 0.587 * frames[..., 1]
             + 0.114 * frames[..., 2])
    y_back = (0.299 * back[..., 0] + 0.587 * back[..., 1]
              + 0.114 * back[..., 2])
    assert np.abs(y_src - y_back).mean() < 2.0
    # chroma-flat frames round-trip almost exactly
    flat = np.full((1, 16, 16, 3), 117, np.uint8)
    back2 = np.asarray(i420_to_rgb_flat(rgb_to_i420(flat))).reshape(flat.shape)
    assert np.abs(back2.astype(int) - 117).max() <= 1


def test_roundtrip_on_smooth_content():
    """On chroma-smooth content (the realistic case — video chroma varies
    slowly), the round trip is within a couple of LSB everywhere."""
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    img = np.stack(
        [100 + 40 * np.sin(yy / 17), 120 + 30 * np.cos(xx / 13),
         90 + 25 * np.sin((xx + yy) / 23)], axis=-1,
    )
    img = np.clip(img, 0, 255).astype(np.uint8)[None]
    back = np.asarray(i420_to_rgb_flat(rgb_to_i420(img))).reshape(img.shape)
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 4


def test_geometry_assertion():
    with pytest.raises(AssertionError):
        rgb_to_i420(np.zeros((1, 30, 33, 3), np.uint8))  # W odd


def _segmenter(transport, **kw):
    import jax.numpy as jnp

    from tpuseg.models import init_drnseg
    from tpuseg.video.pipeline import VideoSegmenter

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    return VideoSegmenter(
        params, state, spec, [0.5] * 3, [0.25] * 3,
        compute_dtype=jnp.bfloat16, batch=2, transport=transport, **kw,
    )


def test_serving_parity_rgb_vs_yuv420():
    """ids from yuv420 transport agree with rgb transport on structured
    content (chroma loss only matters at color edges)."""
    from tpuseg.data.shapes import shapes_video
    from tpuseg.ops.quant import ids_agreement

    frames, _ = shapes_video(4, (64, 64), seed=3, speed=3.0)
    ids_rgb = _segmenter("rgb").run(list(frames), need_color=False)["ids"]
    ids_yuv = _segmenter("yuv420").run(list(frames), need_color=False)["ids"]
    assert ids_rgb.shape == ids_yuv.shape
    # RANDOM weights draw noisy boundaries that amplify chroma loss; the
    # trained-weights number is what matters (tools/trained_fidelity mode
    # "yuv420": >99% on converged weights)
    assert ids_agreement(ids_rgb, ids_yuv) > 0.85


def test_yuv420_budget_mode_runs():
    """transport composes with the budgeted adaptive mode (carry lives in
    decode-res RGB; the shipped array is planar)."""
    from tpuseg.data.shapes import shapes_video

    frames, _ = shapes_video(6, (64, 64), seed=4, speed=5.0)
    seg = _segmenter("yuv420", temporal_thresh=3.0, temporal_budget=1)
    out = seg.run(list(frames), need_color=False)
    assert out["frames"] == 6
    assert 0 < out["promotion_rate"] <= 1.0


def test_native_decoder_i420_output():
    """NativeFrameSource(fmt='i420') emits packed planes consistent with
    the host rgb_to_i420 of the RGB decode of the same video (both derive
    from the same source YUV; rounding paths differ slightly)."""
    import os

    pytest.importorskip("cv2")
    from tpuseg.video.native_source import NativeFrameSource, available

    if not available():
        pytest.skip("libtpuseg_videodec.so not built")
    path = "/root/reference/sample.mp4"
    if not os.path.exists(path):
        pytest.skip("reference sample video absent")
    size = (128, 128)
    it_p = iter(NativeFrameSource(path, size, fmt="i420"))
    it_rgb = iter(NativeFrameSource(path, size, fmt="rgb"))
    for _ in range(3):
        planar = next(it_p)
        rgb = next(it_rgb)
        assert planar.shape == (192, 128) and planar.dtype == np.uint8
        ref = rgb_to_i420(rgb)[0]
        # luma must agree tightly; chroma within subsampling/rounding slack
        h = 128
        assert np.abs(planar[:h].astype(int) - ref[:h].astype(int)).mean() < 3.0
        assert np.abs(planar[h:].astype(int) - ref[h:].astype(int)).mean() < 4.0


def test_frame_source_i420_fallback_matches_native_shape():
    """FrameSource(fmt='i420') yields packed planes through whichever
    decode path is available (native or cv2+host-convert)."""
    import os

    from tpuseg.video.pipeline import FrameSource

    path = "/root/reference/sample.mp4"
    if not os.path.exists(path):
        pytest.skip("reference sample video absent")
    frames = [f for _, f in zip(range(2), FrameSource(path, (64, 64),
                                                      fmt="i420"))]
    assert all(f.shape == (96, 64) and f.dtype == np.uint8 for f in frames)


def _write_raw_bgr_avi(path, frames, fps=10):
    """Uncompressed BI_RGB (bottom-up BGR24) AVI — pure-python encoder so
    the suite can fabricate an RGB-pixel-format video (no ffmpeg CLI in
    this image).  Width must be a multiple of 4 (no DIB row padding)."""
    import struct

    h, w = frames[0].shape[:2]
    n = len(frames)
    fb = w * h * 3

    def chunk(tag, data):
        pad = b"\0" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    def lst(four, data):
        return chunk(b"LIST", four + data)

    avih = chunk(b"avih", struct.pack(
        "<14I", int(1e6 / fps), fb * fps, 0, 0x10, n, 0, 1, fb, w, h,
        0, 0, 0, 0))
    strh = chunk(b"strh", b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, fb, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h))
    strf = chunk(b"strf", struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, fb, 0, 0, 0, 0))
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi = lst(b"movi", b"".join(
        chunk(b"00db", f[::-1].astype(np.uint8)[..., ::-1].tobytes())
        for f in frames))
    riff = b"AVI " + hdrl + movi
    with open(path, "wb") as fo:
        fo.write(b"RIFF" + struct.pack("<I", len(riff)) + riff)


def test_native_decoder_i420_full_range_on_rgb_source(tmp_path):
    """Round-4 review: an RGB-pixel-format source (screen captures,
    png2mp4, rawvideo) tags its frames JPEG-range, but sws's RGB->YUV
    converters emit STUDIO range regardless — the decoder must still
    expand to the packed-I420 contract's full range (else device-side
    reconstruction washes out: black 16, white 235)."""
    from tpuseg.video.native_source import NativeFrameSource, available

    if not available():
        pytest.skip("libtpuseg_videodec.so not built")
    rng = np.random.default_rng(3)
    frames = [np.full((64, 64, 3), v, np.uint8) for v in (0, 255)]
    frames.append(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))
    path = str(tmp_path / "rgbsrc.avi")
    _write_raw_bgr_avi(path, frames)
    # RGB decode of a raw BGR video is bit-exact — sanity anchor
    it_rgb = iter(NativeFrameSource(path, (64, 64), fmt="rgb"))
    np.testing.assert_array_equal(next(it_rgb), frames[0])
    it = iter(NativeFrameSource(path, (64, 64), fmt="i420"))
    y_black = next(it)[:64].mean()
    y_white = next(it)[:64].mean()
    assert y_black < 2.0, f"black luma {y_black} (studio-range leak: 16)"
    assert y_white > 253.0, f"white luma {y_white} (studio-range leak: 235)"
    # and the full conversion agrees with the host-side reference packer
    diff = np.abs(next(it).astype(int)
                  - rgb_to_i420(frames[2][None])[0].astype(int))
    assert diff.mean() < 2.0


def test_yuv420_run_accepts_planar_frames():
    """VideoSegmenter(transport='yuv420') consumes pre-packed I420 frames
    (the native-decoder path) and produces the same ids as RGB frames of
    the same content put through the transport's own conversion."""
    from tpuseg.data.shapes import shapes_video
    from tpuseg.ops.quant import ids_agreement

    frames, _ = shapes_video(4, (64, 64), seed=9, speed=3.0)
    planar = list(rgb_to_i420(frames))
    seg = _segmenter("yuv420")
    ids_a = seg.run(list(frames), need_color=False)["ids"]
    ids_b = _segmenter("yuv420").run(planar, need_color=False)["ids"]
    np.testing.assert_array_equal(ids_a, ids_b)
