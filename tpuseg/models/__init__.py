"""Model zoo: DRN backbones, DRNSeg segmentation head, CIFAR classifiers.

Parameters are flat dicts ``{name: jnp.ndarray}`` with torch-style names so
that the reference's pruning configs and checkpoints map 1:1
(cf. /root/reference/drn.py, /root/reference/semantic_seg.py:126-164).
"""
from tpuseg.models.drn import (  # noqa: F401
    DRN_ARCHS,
    DrnSpec,
    build_drn_spec,
    drn_forward,
    init_drn,
)
from tpuseg.models.drnseg import (  # noqa: F401
    bilinear_upsample_kernel,
    drnseg_forward,
    init_drnseg,
)
from tpuseg.models.factory import create_model, num_classes_for_dataset  # noqa: F401
