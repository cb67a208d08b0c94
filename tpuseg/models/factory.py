"""Model factory: dataset/arch dispatch.

Behavioral reference: /root/reference/utils.py:153-213 (``create_model``) —
torchvision name -> lmodels name -> drn seg assembly; classes per dataset at
utils.py:164-174.
"""

from __future__ import annotations

import jax

from tpuseg.models import drn as drn_lib
from tpuseg.models import drnseg as drnseg_lib

DATASET_CLASSES = {
    "imagenet": 1000,
    "cifar10": 10,
    "cifar100": 100,
    "mnist": 10,
    "cityscapes": 19,
    "ade20k": 150,
    "voc": 21,
}


def num_classes_for_dataset(dataset: str) -> int:
    return DATASET_CLASSES[dataset.lower()]


def create_model(key: jax.Array, dataset: str, arch: str):
    """Build ``(params, state, spec, apply_kwargs)`` for a (dataset, arch) pair.

    Segmentation datasets get a DRNSeg assembly; classification datasets get
    the plain DRN classifier or a CIFAR-zoo model.
    """
    dataset = dataset.lower()
    classes = num_classes_for_dataset(dataset)
    if dataset in ("cityscapes", "ade20k", "voc"):
        params, state, spec = drnseg_lib.init_drnseg(key, arch, classes)
        return params, state, spec, {"kind": "seg", "classes": classes}
    if arch in drn_lib.DRN_ARCHS:
        spec = drn_lib.build_drn_spec(arch, num_classes=classes, naming="cls")
        params, state = drn_lib.init_drn(key, spec)
        return params, state, spec, {"kind": "cls", "classes": classes}
    # CIFAR zoo (lmodels/): resnets, vgg, wrn
    from tpuseg.models import cifar as cifar_lib

    params, state, spec = cifar_lib.create_cifar_model(key, arch, classes)
    return params, state, spec, {"kind": "cls", "classes": classes}
