"""The shapes world (tpuseg.data.shapes): the trained-weights fidelity
proxy must be deterministic, label-consistent, and actually moving."""

import numpy as np

from tpuseg.data import shapes


def test_render_deterministic():
    rng1 = np.random.default_rng(3)
    rng2 = np.random.default_rng(3)
    objs1 = shapes.sample_scene(rng1, 64, 96)
    objs2 = shapes.sample_scene(rng2, 64, 96)
    img1, lab1 = shapes.render_scene(objs1, 64, 96, rng1)
    img2, lab2 = shapes.render_scene(objs2, 64, 96, rng2)
    np.testing.assert_array_equal(img1, img2)
    np.testing.assert_array_equal(lab1, lab2)


def test_labels_cover_classes_and_match_colors():
    rng = np.random.default_rng(0)
    seen = set()
    for _ in range(8):
        objs = shapes.sample_scene(rng, 96, 96)
        img, lab = shapes.render_scene(objs, 96, 96, rng)
        seen.update(np.unique(lab).tolist())
        # the mean color over each class region approaches its base color
        for c in np.unique(lab):
            region = img[lab == c].astype(np.float32)
            if len(region) > 500:
                np.testing.assert_allclose(
                    region.mean(0), shapes.CLASS_COLORS[c], atol=6.0
                )
    assert 0 in seen and len(seen) >= 4


def test_video_moves_and_is_deterministic():
    f1, l1 = shapes.shapes_video(6, (64, 64), seed=5, speed=6.0)
    f2, l2 = shapes.shapes_video(6, (64, 64), seed=5, speed=6.0)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(l1, l2)
    assert f1.shape == (6, 64, 64, 3) and l1.shape == (6, 64, 64)
    # objects actually move: consecutive labels differ, and motion
    # dominates sensor noise in the frame delta
    moved = [(l1[t] != l1[t + 1]).mean() for t in range(5)]
    assert all(m > 0.001 for m in moved), moved
    # the fixed-texture design keeps static-background deltas small
    delta = np.abs(f1[1].astype(np.int16) - f1[0].astype(np.int16)).mean()
    static = l1[0] == l1[1]
    delta_static = np.abs(
        f1[1].astype(np.int16) - f1[0].astype(np.int16)
    )[static].mean()
    assert delta_static < 5.0, delta_static  # sensor sigma 2 only
    assert delta > delta_static  # moving boundaries add signal


def test_bounce_stays_in_bounds():
    for x in np.linspace(-300, 900, 61):
        y = shapes._bounce(float(x), 256, 20.0)
        assert 20.0 <= y <= 236.0, (x, y)


def test_dataset_emission_roundtrip(tmp_path):
    out = shapes.make_shapes_dataset(
        str(tmp_path / "ds"), n_train=3, n_val=2, size=(48, 48), seed=1
    )
    from tpuseg.data.cityscapes import SegList, load_info

    info = load_info(out)
    assert info["classes"] == shapes.N_CLASSES
    ident = lambda *xs: xs  # noqa: E731
    train = SegList(out, "train", ident)
    img, lab = train[0]
    assert np.asarray(img).shape[:2] == (48, 48)
    assert np.asarray(lab).max() < shapes.N_CLASSES
    assert len(train) == 3 and len(SegList(out, "val", ident)) == 2


def test_cls_batch_learnable_and_balanced():
    rng = np.random.default_rng(2)
    x, y = shapes.sample_cls_batch(rng, 512)
    assert x.shape == (512, 32, 32, 3) and y.shape == (512,)
    assert x.dtype == np.float32
    assert len(np.unique(y)) == 10
    # normalized roughly to unit scale
    assert abs(float(x.mean())) < 0.5 and 0.3 < float(x.std()) < 3.0
    # same-class images are more alike than cross-class (color carries
    # class): nearest-centroid classification beats chance by a lot
    cents = np.stack([x[y == c].mean(0) for c in range(10)])
    d = ((x[:, None] - cents[None]) ** 2).reshape(512, 10, -1).mean(-1)
    acc = (np.argmin(d, 1) == y).mean()
    assert acc > 0.5, acc
