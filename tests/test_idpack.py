"""5-bit class-id packing for the D2H fetch (tpuseg.ops.idpack +
VideoSegmenter ids_bits): exact round trip, pipeline-level bit-parity
across serving modes."""

import numpy as np
import pytest


def test_roundtrip_all_widths():
    import jax

    from tpuseg.ops.idpack import pack_ids, packed_width, unpack_ids

    rng = np.random.default_rng(0)
    for bits in range(1, 9):
        ids = rng.integers(0, 2 ** bits, size=(3, 17, 64), dtype=np.uint8)
        packed = np.asarray(
            jax.jit(lambda x, b=bits: pack_ids(x, b))(ids)
        )
        assert packed.shape == (3, 17, packed_width(64, bits))
        assert np.array_equal(unpack_ids(packed, bits), ids), bits


def test_roundtrip_boundary_values():
    from tpuseg.ops.idpack import pack_ids, unpack_ids

    for bits in (4, 5):
        top = np.full((1, 2, 16), 2 ** bits - 1, np.uint8)
        zero = np.zeros((1, 2, 16), np.uint8)
        for ids in (top, zero):
            packed = np.asarray(pack_ids(ids, bits))
            assert np.array_equal(unpack_ids(packed, bits), ids)


def test_width_must_be_multiple_of_8():
    from tpuseg.ops.idpack import pack_ids

    with pytest.raises(AssertionError):
        pack_ids(np.zeros((1, 2, 12), np.uint8), 5)


def _segmenter(**kw):
    import jax.numpy as jnp

    from tpuseg.models import init_drnseg
    from tpuseg.video.pipeline import VideoSegmenter

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    return VideoSegmenter(
        params, state, spec, [0.5] * 3, [0.25] * 3,
        compute_dtype=jnp.bfloat16, batch=2, **kw,
    )


def test_pipeline_ids_pack_bit_parity():
    """ids_bits=5 is EXACT: the packed-fetch run returns bit-identical ids
    (unlike yuv420/temporal, no fidelity loss to measure)."""
    from tpuseg.data.shapes import shapes_video

    frames, _ = shapes_video(4, (64, 64), seed=3, speed=3.0)
    ids_ref = _segmenter().run(list(frames), need_color=False)["ids"]
    ids_pk = _segmenter(ids_bits=5).run(list(frames), need_color=False)["ids"]
    assert ids_pk.dtype == np.uint8
    assert np.array_equal(ids_ref, ids_pk)


def test_pipeline_ids_pack_composes_with_budget_and_yuv():
    """packing applies to the budget program's ids-only branch and stacks
    with the yuv420 transport (both link legs shrunk)."""
    from tpuseg.data.shapes import shapes_video

    frames, _ = shapes_video(6, (64, 64), seed=4, speed=5.0)
    kw = dict(temporal_thresh=3.0, temporal_budget=1, transport="yuv420")
    ids_ref = _segmenter(**kw).run(list(frames), need_color=False)["ids"]
    ids_pk = _segmenter(ids_bits=5, **kw).run(
        list(frames), need_color=False
    )["ids"]
    assert np.array_equal(ids_ref, ids_pk)


def test_pipeline_ids_pack_rejects_too_many_classes():
    with pytest.raises(AssertionError):
        _segmenter(ids_bits=4)  # 19 classes need 5 bits


def test_cli_ids_pack_auto_policy():
    """--ids-pack default is AUTO: packs for ids-only serving at <=32
    classes with 8-divisible width; explicit 0 disables, explicit BITS
    wins; --device-outputs and odd widths opt out."""
    from tpuseg.cli.seg_video import _resolve_ids_pack, parse_args

    def resolve(extra, w=2048):
        args = parse_args(["--video", "shapes", *extra])
        return _resolve_ids_pack(args, w)

    assert resolve([]) == 5                        # 19 classes -> 5 bits
    assert resolve(["--classes", "16"]) == 4
    assert resolve(["--classes", "2"]) == 1
    assert resolve(["--classes", "33"]) is None    # >32: stays unpacked
    assert resolve(["--ids-pack", "0"]) is None    # explicit off
    assert resolve(["--ids-pack", "4"]) == 4       # explicit wins
    assert resolve(["--device-outputs"]) is None   # no ids-only fetch
    assert resolve([], w=100) is None              # width not /8
