"""Determinism guarantees the reference lacks (SURVEY.md §5): seeded masks,
reproducible init, mask-carrying checkpoints."""

import numpy as np

from tpuseg.models import init_drnseg
from tpuseg.sparsity import create_masker


def test_masker_deterministic_by_seed():
    import os

    from conftest import VENDORED_CONFIGS

    params, _, _ = init_drnseg(0, "drn_d_22", 19)
    cfg = os.path.join(
        VENDORED_CONFIGS, "drn_d_22", "drn_d_22_512X512_0.00_50.00.json"
    )
    m1 = create_masker(cfg, seed=7).generate_masks(params)
    m2 = create_masker(cfg, seed=7).generate_masks(params)
    m3 = create_masker(cfg, seed=8).generate_masks(params)
    for k in m1:
        np.testing.assert_array_equal(m1[k], m2[k])
    assert any(not np.array_equal(m1[k], m3[k]) for k in m1), (
        "different seeds should produce different RAMANUJAN masks"
    )


def test_init_deterministic():
    p1, s1, _ = init_drnseg(3, "drn_d_22", 19)
    p2, s2, _ = init_drnseg(3, "drn_d_22", 19)
    for k in p1:
        np.testing.assert_array_equal(np.asarray(p1[k]), np.asarray(p2[k]))
    p3, _, _ = init_drnseg(4, "drn_d_22", 19)
    assert not np.array_equal(np.asarray(p1["seg.weight"]), np.asarray(p3["seg.weight"]))


def test_construct_maskers_use_rng_not_global():
    """Static/random maskers must not touch the global numpy RNG state."""
    params = {"w": np.random.default_rng(0).normal(size=(8, 8, 1, 1)).transpose(2, 3, 1, 0)}
    cfg = {
        "pruner_type": "block",
        "configs": [{"layer_set": ["w"], "sparsity": 0.5, "block_height": 2,
                     "block_width": 2, "sub_rows": -1, "sub_cols": -1,
                     "collapse_tensor": True}],
    }
    state_before = np.random.get_state()[1].copy()
    create_masker(cfg, seed=1).generate_masks(params, is_static=True)
    state_after = np.random.get_state()[1]
    np.testing.assert_array_equal(state_before, state_after)
