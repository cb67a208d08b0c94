"""Build the native C++ sparsity library: ``python -m tpuseg.native_build``."""

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


if __name__ == "__main__":
    sys.exit(0 if os.path.exists(build()) else 1)
