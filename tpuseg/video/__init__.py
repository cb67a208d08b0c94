from tpuseg.video.pipeline import (  # noqa: F401
    FrameSource,
    SyntheticFrames,
    VideoSegmenter,
)
