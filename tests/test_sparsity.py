"""Mask-generator tests: exact parity with the reference pruners where the
algorithm is deterministic, structural property tests where it is random,
and golden-format serialization checks."""

import json
import os
import sys

import numpy as np
import pytest

from conftest import requires_reference

from tpuseg.sparsity import (
    BlockMasker,
    GroupingMasker,
    HbMasker,
    RmbMasker,
    RmcdbMasker,
    SRMBRepMasker,
    apply_masks,
    create_masker,
    mask_sparsity_stats,
    patterns,
)
from tpuseg.sparsity.block import BlockConfig, prune_as_block
from tpuseg.sparsity.formats import to_block_matrix, write_block_matrix, write_rmb_matrix
from tpuseg.sparsity.rmb import BlockletType, RmbConfig, prune_as_rmb
from tpuseg.sparsity.srmbrep import SRMBRepConfig, construct_srmbrep_mask


def _ref_pruners():
    sys.path.insert(0, "/root/reference")
    import pruners.BlockPruner as ref_block

    return ref_block


# --------------------------------------------------------------------------
# patterns
# --------------------------------------------------------------------------


@pytest.mark.parametrize("pat", ["UROW", "RAMANUJAN", "CDIA", "CDIASTRIDE",
                                 "CBAND", "CCDIA", "CCOLUMN", "COLUMN", "GROUP"])
def test_pattern_row_regularity(pat):
    rng = np.random.default_rng(0)
    M = N = 16
    sp = 0.5
    m = patterns.generate_sparsity_pattern(M, N, sp, pat, rng)
    assert m.shape == (M, N)
    nnz_per_row = int((1 - sp) * N)
    np.testing.assert_array_equal(m.sum(axis=1), nnz_per_row)


def test_ramanujan_pattern_biregular():
    rng = np.random.default_rng(3)
    m = patterns.ramanujan_pattern(16, 32, 8, rng)
    np.testing.assert_array_equal(m.sum(axis=1), 8)  # left degree
    np.testing.assert_array_equal(m.sum(axis=0), 4)  # right degree rows*d/cols


def test_random_pattern_total_nnz():
    rng = np.random.default_rng(1)
    m = patterns.generate_sparsity_pattern(8, 8, 0.75, "RANDOM", rng)
    assert m.sum() == 8 * 8 // 4


def test_trans_pattern_doubly_regular():
    rng = np.random.default_rng(2)
    # sparse regime
    m = patterns.generate_sparsity_pattern(16, 16, 0.875, "TRANS", rng)
    np.testing.assert_array_equal(m.sum(axis=1), 2)
    np.testing.assert_array_equal(m.sum(axis=0), 2)
    # dense regime
    m = patterns.generate_sparsity_pattern(8, 8, 0.25, "TRANS", rng)
    np.testing.assert_array_equal(m.sum(axis=1), 6)
    np.testing.assert_array_equal(m.sum(axis=0), 6)


# --------------------------------------------------------------------------
# block masker
# --------------------------------------------------------------------------


@requires_reference
@pytest.mark.parametrize(
    "shape,bh,bw,sub,sparsity",
    [
        ((8, 8), 2, 2, (4, 4), 0.5),
        ((16, 32), 4, 4, (-1, -1), 0.75),
        ((16, 8, 3, 3), 2, 2, (-1, -1), 0.5),
        ((16, 16), 1, 1, (-1, -1), 0.5),
    ],
)
def test_block_prune_parity(shape, bh, bw, sub, sparsity):
    ref_block = _ref_pruners()
    rng = np.random.default_rng(42)
    t = rng.normal(size=shape)
    ours = prune_as_block(
        t, BlockConfig(sparsity, bh, bw, sub[0], sub[1], collapse_tensor=True)
    )
    theirs = ref_block.BlockPruner.prune_tensor_as_block(
        t, sparsity, bh, bw, sub[0], sub[1], collapse_tensor=True
    )
    np.testing.assert_array_equal(ours, np.asarray(theirs, dtype=ours.dtype))


@requires_reference
def test_block_prune_noncollapse_parity():
    ref_block = _ref_pruners()
    rng = np.random.default_rng(7)
    t = rng.normal(size=(8, 4, 3, 3))
    ours = prune_as_block(t, BlockConfig(0.5, 2, 2, -1, -1, collapse_tensor=False))
    theirs = ref_block.BlockPruner.prune_tensor_as_block(
        t, 0.5, 2, 2, -1, -1, collapse_tensor=False
    )
    np.testing.assert_array_equal(ours, np.asarray(theirs, dtype=ours.dtype))


def test_block_construct_sparsity_exact():
    rng = np.random.default_rng(0)
    from tpuseg.sparsity.block import construct_as_block

    t = np.ones((16, 16))
    m = construct_as_block(t, BlockConfig(0.75, 4, 4, -1, -1, True), rng)
    assert m.sum() == 16 * 16 // 4  # 4 surviving 4x4 blocks


def test_block_golden_file_format(tmp_path):
    """Reproduce the semantics of pruners/block_test.txt
    (BlockPruner.test, BlockPruner.py:436-468)."""
    rng = np.random.default_rng(5)
    arr = np.arange(64) + 1
    rng.shuffle(arr)
    mat = arr.reshape(8, 8)  # integer matrix, like the reference self-test
    mask = prune_as_block(mat, BlockConfig(0.5, 2, 2, 4, 4, True))
    bm = to_block_matrix((mat * mask).astype(mat.dtype), 2, 2)
    path = tmp_path / "block_test.txt"
    write_block_matrix(bm, str(path))
    lines = path.read_text().splitlines()
    assert lines[:5] == ["8", "8", "2", "2", "8"]
    values = [int(v) for v in lines[5].split()]
    assert len(values) == 8 * 4  # 8 blocks x 4 values
    row_ptr = [int(v) for v in lines[7].split()]
    assert row_ptr == sorted(row_ptr) and row_ptr[-1] == 8
    assert len(row_ptr) == 5  # nrb + 1 row-block pointers


@requires_reference
def test_block_golden_matches_reference_exactly(tmp_path):
    """Same matrix through ours and the reference -> identical file bytes."""
    ref_block = _ref_pruners()
    rng = np.random.default_rng(11)
    mat = rng.integers(1, 65, size=(8, 8)).astype(float)
    mask = prune_as_block(mat, BlockConfig(0.5, 2, 2, 4, 4, True))
    ours_path = tmp_path / "ours.txt"
    bm = to_block_matrix(mat * mask, 2, 2)
    write_block_matrix(bm, str(ours_path))

    ref_bm = ref_block.BlockPruner.generate_block_matrix(mat * mask, 2, 2)
    ref_path = tmp_path / "ref.txt"
    ref_block.BlockPruner.write_block_matrix_to_file(ref_bm, str(ref_path))
    assert ours_path.read_text() == ref_path.read_text()


# --------------------------------------------------------------------------
# rmb masker
# --------------------------------------------------------------------------


@requires_reference
def test_rmb_prune_parity():
    sys.path.insert(0, "/root/reference")
    from pruners.RmbPruner import BlockletType as RefBlT
    from pruners.RmbPruner import RmbPruner as RefRmb
    from pruners.RmbPruner import RmbPrunerConfig as RefCfg

    rng = np.random.default_rng(3)
    t = rng.normal(size=(8, 8))
    cfg = RmbConfig(4, 4, 0.5, [BlockletType(2, 2), BlockletType(1, 1)], [1, 1])
    ours, _ = prune_as_rmb(t, cfg)

    ref_cfg = RefCfg(4, 4, 0.5, [RefBlT(2, 2), RefBlT(1, 1)], [1, 1])
    theirs = RefRmb.prune_tensor_as_rmb(t.copy(), ref_cfg)
    np.testing.assert_array_equal(ours, np.asarray(theirs, dtype=ours.dtype))


def test_rmb_mixed_block_dims_outer_selection():
    """Round-4 review: the |mat| outer-meta fast path is only valid when
    BOTH block dims are 1.  Mixed dims (2x1 / 1x4) must score via
    block_abs_sums — the reference's `bh != 1 and bw != 1` gate mis-scores
    or crashes here (same bug class as the fixed rmcdb `rb`); the old C++
    `||` gate additionally overflowed its nrb*ncb meta buffer."""
    from tpuseg.sparsity.block import block_abs_sums

    rng = np.random.default_rng(5)
    # blocklet == the whole block so a surviving block fills fully and the
    # test isolates the OUTER selection (the buggy path)
    for bh, bw, shape in [(2, 1, (4, 8)), (1, 4, (4, 8))]:
        t = rng.normal(size=shape)
        cfg = RmbConfig(bh, bw, 0.5, [BlockletType(bh, bw)], [1])
        mask, _ = prune_as_rmb(t, cfg)
        # expected: per row-block drop blocks scoring <= the k-th smallest
        # |sum|; survivors fill fully
        meta = block_abs_sums(t.reshape(t.shape[0], -1), bh, bw)
        thresh_ind = int(0.5 * meta.shape[1]) - 1
        expected = np.zeros(shape)
        for rb in range(meta.shape[0]):
            thr = np.sort(np.abs(meta[rb]))[thresh_ind]
            for cb in range(meta.shape[1]):
                if meta[rb, cb] > thr:
                    expected[rb * bh:(rb + 1) * bh,
                             cb * bw:(cb + 1) * bw] = 1.0
        np.testing.assert_array_equal(mask, expected)
        # native fast path must agree with the python reference
        from tpuseg import native

        if native.available():
            nat = native.rmb_prune(
                np.ascontiguousarray(t.reshape(t.shape[0], -1), np.float32),
                bh, bw, 0.5, cfg.bl_types, cfg.bl_counts,
            )
            np.testing.assert_array_equal(nat.reshape(shape), expected)


def test_rmb_export_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    t = rng.normal(size=(8, 8))
    cfg = RmbConfig(4, 4, 0.0, [BlockletType(2, 2)], [1])
    mask, blocklets = prune_as_rmb(t, cfg, collect=True)
    path = tmp_path / "rmb.txt"
    write_rmb_matrix(8, 8, 4, 4, blocklets, str(path))
    lines = path.read_text().splitlines()
    assert lines[0] == "8" and lines[1] == "8"
    # 4 global blocks, 1 blocklet each, each blocklet = 2 rows of 2x2 = 8 nnz
    assert lines[4] == "32" and lines[5] == "4" and lines[6] == "4"


# --------------------------------------------------------------------------
# rmcdb masker
# --------------------------------------------------------------------------


def test_rmcdb_construct_structure():
    from tpuseg.sparsity.rmcdb import (
        BlockletType as CT,
        RmcdbConfig,
        construct_rmcdb,
    )

    rng = np.random.default_rng(0)
    cfg = RmcdbConfig(4, 4, 0.0, [CT(1, 1)], [1])
    m = construct_rmcdb(np.zeros((8, 8)), cfg, rng)
    # each 4x4 block gets exactly one cyclic diagonal of 1x1 blocklets = 4 nnz
    assert m.sum() == 4 * 4
    blocks = m.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3)
    for rb in range(2):
        for cb in range(2):
            np.testing.assert_array_equal(blocks[rb, cb].sum(axis=1), 1)


def test_rmcdb_prune_picks_best_diagonal():
    from tpuseg.sparsity.rmcdb import BlockletType as CT, RmcdbConfig, prune_as_rmcdb

    cfg = RmcdbConfig(4, 4, 0.0, [CT(1, 1)], [1])
    # construct a matrix where the main diagonal dominates
    t = np.eye(4) * 100 + 0.01
    m, bls = prune_as_rmcdb(t, cfg, collect=True)
    np.testing.assert_array_equal(m, np.eye(4))
    assert bls[0].offset == 0


# --------------------------------------------------------------------------
# srmbrep / RBGP masker
# --------------------------------------------------------------------------


def test_srmbrep_kron_structure():
    rng = np.random.default_rng(0)
    cfg = SRMBRepConfig(
        obh=16, obw=16, cbh=8, cbw=16, ibh=2, ibw=2,
        osp=0, opat="RAMANUJAN", isp=0.5, ipat="RAMANUJAN",
        is_repetitive=True, collapse_tensor=True,
    )
    t = np.zeros((16, 16, 3, 3))
    m = construct_srmbrep_mask(t, cfg, rng)
    assert m.shape == t.shape
    flat = m.reshape(16, 16 * 9)
    # row-regular at 50% inner sparsity
    np.testing.assert_array_equal(flat.sum(axis=1), 16 * 9 // 2)
    # with collapse_tensor=True the kernel dims are folded into the columns,
    # so inner blocks are ibh x ibw = 2x2 in *collapsed* space
    blocks = flat.reshape(8, 2, 72, 2)
    per_block = blocks.transpose(0, 2, 1, 3).reshape(-1, 4).sum(axis=1)
    assert set(per_block.tolist()) <= {0.0, 4.0}


def test_srmbrep_repetitive_tiles_identical():
    rng = np.random.default_rng(1)
    cfg = SRMBRepConfig(
        obh=8, obw=8, cbh=8, cbw=8, ibh=1, ibw=1,
        osp=0, opat="UROW", isp=0.5, ipat="RAMANUJAN",
        is_repetitive=True, collapse_tensor=True,
    )
    m = construct_srmbrep_mask(np.zeros((16, 16)), cfg, rng)
    tiles = m.reshape(2, 8, 2, 8).transpose(0, 2, 1, 3).reshape(4, 8, 8)
    for i in range(1, 4):
        np.testing.assert_array_equal(tiles[0], tiles[i])


def test_srmbrep_from_shipped_config():
    """The vendored optimal_configs apply verbatim to our DRN-D-22 params
    (self-contained — no reference mirror needed)."""
    from conftest import VENDORED_CONFIGS

    cfg_path = os.path.join(
        VENDORED_CONFIGS, "drn_d_22", "drn_d_22_512X512_0.00_50.00.json"
    )
    from tpuseg.models import init_drnseg

    params, _, _ = init_drnseg(0, "drn_d_22", 19)
    masker = create_masker(cfg_path, seed=0)
    masks = masker.generate_masks(params)
    assert len(masks) == 24
    stats = mask_sparsity_stats(masks)
    for layer, sp in stats.items():
        assert abs(sp - 50.0) < 1e-6, (layer, sp)
    # masks are in storage layout (HWIO for convs)
    assert masks["layer.3.0.conv1.weight"].shape == params["layer.3.0.conv1.weight"].shape


def test_apply_masks_pure():
    params = {"a": np.ones((4, 4)), "b": np.ones((2, 2))}
    masks = {"a": np.zeros((4, 4))}
    out = apply_masks(params, masks)
    assert out["a"].sum() == 0
    assert params["a"].sum() == 16  # untouched
    assert out["b"] is params["b"]


# --------------------------------------------------------------------------
# hb + grouping
# --------------------------------------------------------------------------


def test_hb_levels_sum():
    cfg = {
        "pruner_type": "hb",
        "configs": [
            {
                "layer_set": ["w"],
                "levels": [
                    {"sparsity": 0.5, "block_height": 2, "block_width": 2,
                     "sub_rows": -1, "sub_cols": -1, "collapse_tensor": True},
                    {"sparsity": 0.875, "block_height": 1, "block_width": 1,
                     "sub_rows": -1, "sub_cols": -1, "collapse_tensor": True},
                ],
            }
        ],
    }
    masker = create_masker(cfg, seed=0)
    rng = np.random.default_rng(9)
    params = {"w": rng.normal(size=(8, 8))}
    masks = masker.generate_masks(params)
    m = masks["w"]
    # level 1 keeps 8 2x2 blocks (32 elems); level 2 prunes the 64-entry
    # residue at 0.875 with the reference's strictly-greater-than-threshold
    # rule: threshold index int(.875*64)-1 = 55 -> 64-56 = 8 survivors.
    assert m.sum() == 32 + 8
    assert m.max() == 1.0


def test_grouping_block_diagonal():
    cfg = {
        "pruner_type": "grouping",
        "configs": [{"layer_set": ["w"], "num_groups": 4}],
    }
    masker = create_masker(cfg, seed=0)
    params = {"w": np.ones((8, 8, 1, 3))}  # note: storage HWIO (1,3,8,8)->OIHW
    params = {"w": np.ones((1, 3, 8, 8))}  # HWIO: kh=1,kw=3,I=8,O=8
    masks = masker.generate_masks(params)
    m = masks["w"]  # HWIO
    oihw = np.transpose(m, (3, 2, 0, 1))
    flat = oihw.reshape(8, -1)
    assert oihw[0, 0].sum() == 3 and oihw[0, 4].sum() == 0
    assert m.sum() == 8 * 2 * 1 * 3


def test_prunable_layers_drn_fallback():
    """Unlisted drn_* archs inherit the shared DRN exclusion set (stem,
    classifier, seg head, upsampler) — a missing NON_RBGP entry must not
    silently make everything prunable (the drn_d_38 stem emitted a config
    its own masker rejects before this fallback existed)."""
    from tpuseg.cli.expander_batch import prunable_layers

    params = {
        "layer.0.0.weight": np.zeros((7, 7, 3, 16)),
        "layer.3.0.conv1.weight": np.zeros((3, 3, 64, 128)),
        "seg.weight": np.zeros((1, 1, 512, 19)),
        "up.weight": np.zeros((16, 16, 19, 19)),
        "fc.weight": np.zeros((512, 10)),
        "layer.3.0.bn1.weight": np.zeros((128,)),  # not a conv/fc
    }
    for arch in ("drn_d_38", "drn_d_24_nonexistent"):
        assert prunable_layers(params, arch) == ["layer.3.0.conv1.weight"]
    # non-DRN unlisted archs keep the permissive default
    got = prunable_layers(params, "some_cifar_arch")
    assert "layer.0.0.weight" in got and "fc.weight" in got


@pytest.mark.slow
def test_all_vendored_configs_apply():
    """Every vendored optimal_configs JSON (the full matrix tpuseg ships —
    tpuseg.tools.gen_configs) generates masks at exactly the advertised
    sparsity, with no reference mirror mounted.

    Three geometry families per arch: fine-grained srmbrep (reference
    schema, all prunable layers), raw block128 (BlockPruner semantics on
    the multi-block /128 convs — single-block layers excluded, see
    gen_configs.emit_serving_configs), and block128reg (block-level N:M,
    ALL /128 convs)."""
    import glob

    from conftest import VENDORED_CONFIGS
    from tpuseg.models import init_drnseg
    from tpuseg.sparsity import create_masker
    from tpuseg.sparsity.base import mask_sparsity_stats

    seen = 0
    for arch, n_layers, n_serving, n_reg in (
        ("drn_d_22", 24, 12, 15),
        ("drn_d_38", 40, 22, 29),
        ("drn_d_54", 56, 40, 44),
    ):
        params, _state, _spec = init_drnseg(0, arch, 19)
        for f in sorted(glob.glob(
                os.path.join(VENDORED_CONFIGS, arch, "*.json"))):
            seen += 1
            masks = create_masker(f, seed=0).generate_masks(params)
            want = float(f.rsplit("_", 1)[1][:-5])
            stats = mask_sparsity_stats(masks)
            if "block128reg" in f:
                # block-level N:M: every out-block keeps
                # k = max(1, round((1-s)*nib)) in-blocks; all covered
                # layers are exactly /128 so sparsity = 1 - k/nib
                assert len(masks) == n_reg, f
                for layer, sp in stats.items():
                    i = np.transpose(np.asarray(masks[layer]),
                                     (3, 2, 0, 1)).shape[1]
                    nib = i // 128
                    k = max(1, round((1 - want / 100) * nib))
                    exact = 100 * (1 - k / nib)
                    assert abs(sp - exact) < 1e-6, (f, layer, sp, exact)
            elif "block128" in f:
                # raw serving set: 128x128 channel-block masks on the
                # multi-block /128 convs; per-layer sparsity is the exact
                # block quantization floor(s*nb)/nb of the target —
                # except layers BlockPruner's strict per-layer threshold
                # zeroes entirely (every block <= thresh: sp == 100)
                assert len(masks) == n_serving, f
                for layer, sp in stats.items():
                    o, i = (np.transpose(np.asarray(masks[layer]),
                                         (3, 2, 0, 1)).shape[:2])
                    nb = (o // 128) * (i // 128)
                    exact = 100 * int(want / 100 * nb) / nb
                    assert abs(sp - exact) < 1e-6 or sp == 100.0, (
                        f, layer, sp, exact)
            else:
                assert len(masks) == n_layers, f
                for layer, sp in stats.items():
                    assert abs(sp - want) < 1e-6, (f, layer, sp)
    assert seen == 23


@pytest.mark.slow
@requires_reference
def test_all_shipped_configs_apply():
    """Every REFERENCE optimal_configs JSON generates masks at the
    advertised sparsity — except drn_d_22_1024X768_0.00_87.50.json, whose
    layer.1 inner pattern (4x8 at d=1) violates the reference generator's
    own lift-count constraint (SRMBRepMasker.py:109)."""
    import glob

    from tpuseg.models import init_drnseg
    from tpuseg.sparsity import create_masker

    bad = "drn_d_22_1024X768_0.00_87.50.json"
    seen = 0
    for arch in ("drn_d_22", "drn_d_54"):
        params, _state, _spec = init_drnseg(0, arch, 19)
        for f in sorted(glob.glob(
                f"/root/reference/optimal_configs/{arch}/*.json")):
            seen += 1
            if f.endswith(bad):
                with pytest.raises(AssertionError, match="lift count"):
                    create_masker(f, seed=0).generate_masks(
                        params, is_static=True)
                continue
            masks = create_masker(f, seed=0).generate_masks(
                params, is_static=True)
            want = float(f.rsplit("_", 1)[1][:-5]) / 100.0
            got = 1 - np.mean([v.mean() for v in masks.values()])
            assert abs(got - want) < 0.02, (f, got, want)
    assert seen == 12


def test_block_regular_per_out_block_topk():
    """block_regular: every out-block keeps exactly k = round((1-sp)*nib)
    in-blocks (>= 1), chosen by magnitude, uniform across taps."""
    from tpuseg.sparsity.block_regular import (
        BlockRegularConfig,
        prune_as_block_regular,
    )

    rng = np.random.default_rng(0)
    w = rng.normal(size=(256, 512, 3, 3)).astype(np.float32)
    for sp, want_k in [(0.5, 2), (0.75, 1), (0.875, 1)]:
        m = prune_as_block_regular(
            w, BlockRegularConfig(sp, 128, 128))
        assert m.shape == w.shape
        # spatially uniform
        assert (m == m[:, :, :1, :1]).all()
        meta = m[:, :, 0, 0].reshape(2, 128, 4, 128)
        live = (meta.sum(axis=(1, 3)) > 0)  # (nob, nib)
        assert (live.sum(axis=1) == want_k).all(), (sp, live.sum(axis=1))
        # top-k by |block sum|: kept blocks outweigh every dropped one
        sums = np.abs(w).sum(axis=(2, 3)).reshape(2, 128, 4, 128).sum(
            axis=(1, 3))
        for ob in range(2):
            kept = sums[ob][live[ob]]
            dropped = sums[ob][~live[ob]]
            if dropped.size:
                assert kept.min() >= dropped.max()


def test_block_regular_never_kills_small_layers():
    """The geometry that motivated the masker: at 87.5% the 2-block stage-5
    layers lose EVERY block under BlockPruner's static construction
    (int((1-sp)*n_blocks) = 0 — the path the serving CLI uses on
    unconverged weights); block_regular keeps 1 per out-block in both the
    magnitude and static paths."""
    from tpuseg.sparsity.block import BlockConfig, construct_as_block
    from tpuseg.sparsity.block_regular import (
        BlockRegularConfig,
        prune_as_block_regular,
    )

    rng = np.random.default_rng(1)
    w = rng.normal(size=(256, 128, 3, 3)).astype(np.float32)  # 2x1 blocks
    m_ref = construct_as_block(
        w, BlockConfig(0.875, 128, 128, -1, -1, collapse_tensor=False), rng)
    assert m_ref.sum() == 0  # BlockPruner construction kills it entirely
    for static in (False, True):
        m_reg = prune_as_block_regular(
            w, BlockRegularConfig(0.875, 128, 128), rng, is_static=static)
        live = m_reg[:, :, 0, 0].reshape(2, 128, 1, 128).sum(axis=(1, 3)) > 0
        assert live.all()  # every out-block keeps its one in-block


def test_block_regular_masker_roundtrip_and_static():
    """create_masker dispatch, uniform-S serving plans, and the static
    (random) construction keeping exactly k per out-block."""
    import jax.numpy as jnp

    from tpuseg.models import init_drnseg
    from tpuseg.models.sparse_exec import build_sparse_plans
    from tpuseg.ops.fold_bn import fold_bn
    from tpuseg.ops.gathered_conv import GatheredGroupConv
    from tpuseg.sparsity import apply_masks, create_masker

    params, state, spec = init_drnseg(0, "drn_d_22", 19)
    cfg = {
        "pruner_type": "block_regular",
        "configs": [{
            "layer_set": ["layer.6.0.conv1.weight", "layer.7.0.weight"],
            "sparsity": 0.75,
            "block_height": 128,
            "block_width": 128,
        }],
    }
    masker = create_masker(cfg, seed=0)
    masks = masker.generate_masks(params, is_static=False)
    assert set(masks) == {"layer.6.0.conv1.weight", "layer.7.0.weight"}
    folded = fold_bn(dict(apply_masks(params, masks)), state, spec)
    plans, report = build_sparse_plans(
        folded, masks, spec, dtype=jnp.float32, lowering="gathered")
    assert len(plans) == 2, report
    for p in plans.values():
        assert isinstance(p, GatheredGroupConv)
        assert [len(ix) for ix in p.idx] == [1] * len(p.idx)  # uniform S=1

    static = masker.generate_masks(params, is_static=True)
    m = static["layer.6.0.conv1.weight"]  # HWIO (3,3,256,512)
    live = m[0, 0].reshape(2, 128, 4, 128).sum(axis=(1, 3)).T > 0  # (O,I)b
    assert (live.sum(axis=1) == 1).all()  # k = round(0.25*2) = 1 per block


@pytest.mark.slow
def test_vendored_configs_byte_identical_to_regeneration(tmp_path):
    """The vendored optimal_configs/ set is exactly what
    ``python -m tpuseg.tools.gen_configs`` regenerates — same file set,
    same bytes (the CLAUDE.md self-containedness contract: drift in the
    emit functions must not ship unnoticed)."""
    import glob

    from conftest import VENDORED_CONFIGS
    from tpuseg.tools.gen_configs import (
        emit_optimal_configs, emit_regular_configs, emit_serving_configs)

    out = str(tmp_path / "regen")
    emit_optimal_configs(out, verbose=False)
    emit_serving_configs(out, verbose=False)
    emit_regular_configs(out, verbose=False)

    rel = lambda root: sorted(
        os.path.relpath(p, root)
        for p in glob.glob(os.path.join(root, "*", "*.json")))
    assert rel(out) == rel(VENDORED_CONFIGS)
    for r in rel(out):
        with open(os.path.join(out, r), "rb") as fh:
            regen = fh.read()
        with open(os.path.join(VENDORED_CONFIGS, r), "rb") as fh:
            vendored = fh.read()
        assert regen == vendored, f"optimal_configs/{r} drifted from gen_configs"
