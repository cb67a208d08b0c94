from tpuseg.video.autotune import autotune_budget, drift_threshold  # noqa: F401
from tpuseg.video.pipeline import (  # noqa: F401
    FrameSource,
    SyntheticFrames,
    VideoSegmenter,
)
