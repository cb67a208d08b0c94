"""Build the native C++ libraries: ``python -m tpuseg.native_build``.

- libtpuseg_sparsity.so: mask-generation / BSR-packing hot loops
- libtpuseg_videodec.so: multi-threaded ffmpeg decode + resize ring buffer
  (needs libav* dev headers; skipped with a warning when absent)
"""

from __future__ import annotations

import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    here = os.path.dirname(__file__)
    src = os.path.join(here, "..", "native", "sparsity.cpp")
    out = os.path.join(here, "..", "native", "libtpuseg_sparsity.so")
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", out, src,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


def build_videodec(verbose: bool = True) -> str | None:
    here = os.path.dirname(__file__)
    src = os.path.join(here, "..", "native", "videodec.cpp")
    out = os.path.join(here, "..", "native", "libtpuseg_videodec.so")
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-I/usr/include/opencv4",
        "-o", out, src,
        "-lavformat", "-lavcodec", "-lavutil", "-lswscale",
        "-lopencv_core", "-lopencv_imgproc",
    ]
    if verbose:
        print(" ".join(cmd))
    try:
        subprocess.run(cmd, check=True)
    except subprocess.CalledProcessError:
        print("videodec build failed (missing libav dev packages?); "
              "the Python cv2 decode path remains available", file=sys.stderr)
        return None
    return out


if __name__ == "__main__":
    ok = os.path.exists(build())
    build_videodec()
    sys.exit(0 if ok else 1)
