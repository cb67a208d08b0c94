"""Data-layer tests: padding parity with the reference transforms, dataset
list reading, loaders, classification readers."""

import os

import numpy as np
import pytest
from PIL import Image

from conftest import requires_reference

from tpuseg.data import transforms as T
from tpuseg.data.cityscapes import CITYSCAPE_PALETTE, SegList, colorize
from tpuseg.data.loaders import batch_iterator, prefetch_to_device


@requires_reference
def test_pad_reflection_parity():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_dt", "/root/reference/data_transforms.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(5, 7, 3), dtype=np.uint8)
    for pads in [(1, 2, 3, 1), (6, 6, 8, 8), (0, 0, 0, 0)]:
        ours = T.pad_reflection(img, *pads)
        theirs = ref.pad_reflection(img, *pads)
        np.testing.assert_array_equal(ours, theirs)


@requires_reference
def test_pad_constant_parity():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_dt2", "/root/reference/data_transforms.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    ours = T.pad_constant(img, 2, 1, 0, 3, 255)
    theirs = ref.pad_constant(img, 2, 1, 0, 3, 255)
    np.testing.assert_array_equal(ours, theirs)


def test_to_array_and_normalize():
    img = Image.fromarray(
        np.arange(48, dtype=np.uint8).reshape(4, 4, 3), mode="RGB"
    )
    lbl = Image.fromarray(np.full((4, 4), 7, dtype=np.uint8))
    x, y = T.ToArray()(img, lbl)
    assert x.shape == (4, 4, 3) and x.dtype == np.float32
    assert x.max() <= 1.0 and y.dtype == np.int32 and y[0, 0] == 7
    xn, _ = T.Normalize([0.5] * 3, [0.25] * 3)(x, y)
    np.testing.assert_allclose(xn, (x - 0.5) / 0.25, rtol=1e-6)


def test_random_crop_pads_label_with_255():
    rng = np.random.default_rng(0)
    img = Image.fromarray(np.zeros((4, 4, 3), dtype=np.uint8))
    lbl = Image.fromarray(np.zeros((4, 4), dtype=np.uint8))
    out_img, out_lbl = T.RandomCrop(8, rng)(img, lbl)
    assert out_img.size == (8, 8)
    arr = np.asarray(out_lbl)
    assert (arr == 255).sum() == 64 - 16


def test_seglist_and_batching(tmp_path):
    # build a tiny list-file dataset
    os.makedirs(tmp_path / "imgs", exist_ok=True)
    names_i, names_l = [], []
    for i in range(5):
        Image.fromarray(
            np.full((8, 8, 3), i * 10, dtype=np.uint8)
        ).save(tmp_path / "imgs" / f"im{i}.png")
        Image.fromarray(np.full((8, 8), i, dtype=np.uint8)).save(
            tmp_path / "imgs" / f"lb{i}.png"
        )
        names_i.append(f"imgs/im{i}.png")
        names_l.append(f"imgs/lb{i}.png")
    (tmp_path / "val_images.txt").write_text("\n".join(names_i))
    (tmp_path / "val_labels.txt").write_text("\n".join(names_l))

    ds = SegList(str(tmp_path), "val", T.Compose([T.ToArray()]))
    assert len(ds) == 5
    x, y = ds[2]
    assert x.shape == (8, 8, 3) and y[0, 0] == 2

    batches = list(batch_iterator(ds, 2, drop_last=True))
    assert len(batches) == 2
    assert batches[0][0].shape == (2, 8, 8, 3)

    # prefetch preserves order and content
    fetched = list(prefetch_to_device(batch_iterator(ds, 2, drop_last=True)))
    np.testing.assert_allclose(
        np.asarray(fetched[0][0]), batches[0][0], rtol=1e-6
    )


def test_batch_iterator_sharding():
    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return (np.full((2,), i, np.float32),)

    all_idx = set()
    for shard in range(2):
        for (batch,) in batch_iterator(DS(), 2, num_shards=2, shard_index=shard):
            all_idx.update(batch[:, 0].astype(int).tolist())
    assert all_idx == set(range(10))


def test_colorize_palette():
    ids = np.array([[0, 18], [19, 1]], dtype=np.uint8)
    rgb = colorize(ids)
    assert rgb.shape == (2, 2, 3)
    np.testing.assert_array_equal(rgb[0, 0], CITYSCAPE_PALETTE[0])
    np.testing.assert_array_equal(rgb[1, 0], [0, 0, 0])  # void


def test_cifar_reader_roundtrip(tmp_path):
    import pickle

    from tpuseg.data.classification import ArrayClassDataset, load_cifar

    # synthesize a CIFAR-10-format batch
    os.makedirs(tmp_path / "cifar-10-batches-py", exist_ok=True)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(20, 3072), dtype=np.uint8)
    labels = rng.integers(0, 10, size=20).tolist()
    for i in range(1, 6):
        with open(tmp_path / "cifar-10-batches-py" / f"data_batch_{i}", "wb") as fh:
            pickle.dump({b"data": data, b"labels": labels}, fh)
    xs, ys = load_cifar(str(tmp_path), "cifar10", train=True)
    assert xs.shape == (100, 32, 32, 3) and ys.shape == (100,)
    ds = ArrayClassDataset(xs, ys, (0.5,) * 3, (0.25,) * 3, train=True)
    x, y = ds[0]
    assert x.shape == (32, 32, 3)


def test_prefetch_propagates_producer_errors():
    def bad_iter():
        yield (np.zeros((2, 2), np.float32),)
        raise RuntimeError("corrupt sample")

    it = prefetch_to_device(bad_iter())
    next(it)
    with pytest.raises(RuntimeError, match="corrupt sample"):
        list(it)


def test_ade20k_recipe(tmp_path):
    from PIL import Image

    from tpuseg.data.cityscapes import SegList, load_info
    from tpuseg.data.recipes import ade20k_remap_labels, prepare_ade20k_lists

    root = tmp_path / "ade"
    for split in ("training", "validation"):
        (root / "images" / split).mkdir(parents=True)
        (root / "annotations" / split).mkdir(parents=True)
        for i in range(3 if split == "training" else 2):
            Image.fromarray(
                np.zeros((16, 16, 3), np.uint8)).save(
                root / "images" / split / f"ADE_{i:08d}.jpg")
            ann = np.full((16, 16), i + 1, np.uint8)  # classes 1..150
            Image.fromarray(ann).save(
                root / "annotations" / split / f"ADE_{i:08d}.png")
    counts = prepare_ade20k_lists(str(root))
    assert counts == {"train": 3, "val": 2}
    info = load_info(str(root))
    assert len(info["mean"]) == 3
    ds = SegList(str(root), "train", lambda im, lb: (np.asarray(im), lb))
    assert len(ds) == 3
    # remap: raw 1..150 -> 0..149; 0 -> 255
    raw = np.array([[0, 1], [150, 7]], np.uint8)
    out = ade20k_remap_labels(raw)
    assert out.tolist() == [[255, 0], [149, 6]]


def test_voc_recipe_and_palette(tmp_path):
    from PIL import Image

    from tpuseg.data.recipes import prepare_voc_lists, voc_palette

    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    ids = ["2007_000001", "2007_000002"]
    for i in ids:
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            root / "JPEGImages" / f"{i}.jpg")
        Image.fromarray(np.zeros((8, 8), np.uint8)).save(
            root / "SegmentationClass" / f"{i}.png")
    (root / "ImageSets" / "Segmentation" / "train.txt").write_text(
        "\n".join(ids) + "\n")
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text(ids[0] + "\n")
    counts = prepare_voc_lists(str(root))
    assert counts == {"train": 2, "val": 1}
    lines = (root / "train_images.txt").read_text().strip().split("\n")
    assert len(lines) == 2 and lines[0].startswith("JPEGImages/")

    pal = voc_palette()
    # canonical anchors: background black, class1 maroon, class21/255 white-ish
    assert pal[0].tolist() == [0, 0, 0]
    assert pal[1].tolist() == [128, 0, 0]
    assert pal[2].tolist() == [0, 128, 0]
    assert pal[15].tolist() == [192, 128, 128]
