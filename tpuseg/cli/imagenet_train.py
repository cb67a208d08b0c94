"""Vanilla ImageNet classification trainer.

Parity with /root/reference/imagenet_train.py (the stock example used to
produce dense base models) — a front-end over tpuseg.cli.rmbsnn with
pruning/KD disabled and ImageNet defaults (lr 0.1, epochs 90, batch 256).
"""

from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    args = ["--dataset", "imagenet"]
    if "--epochs" not in argv:
        args += ["--epochs", "90"]
    if "--lr" not in argv:
        args += ["--lr", "0.1"]
    if "-b" not in argv and "--batch-size" not in argv:
        args += ["--batch-size", "256"]
    from tpuseg.cli.rmbsnn import main as cls_main

    cls_main(args + argv)


if __name__ == "__main__":
    main()
