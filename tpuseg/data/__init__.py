from tpuseg.data.cityscapes import (  # noqa: F401
    CITYSCAPE_PALETTE,
    TRIPLET_PALETTE,
    SegList,
    SegListMS,
)
from tpuseg.data import transforms  # noqa: F401
from tpuseg.data.loaders import batch_iterator, prefetch_to_device  # noqa: F401
