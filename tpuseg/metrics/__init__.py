from tpuseg.metrics.seg import (  # noqa: F401
    fast_hist,
    fast_hist_jax,
    miou_from_hist,
    per_class_iu,
    pixel_accuracy,
    top_k_accuracy,
)
from tpuseg.metrics.meters import AverageMeter, ProgressMeter, FpsMeter  # noqa: F401
