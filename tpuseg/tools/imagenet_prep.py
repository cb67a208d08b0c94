"""ImageNet directory preparation.

Parity with /root/reference/imagenet-scripts/ (prep_train.py, valprep.sh):
- ``prep_train``: untar each per-class train archive into its synset dir
- ``prep_val``: move validation JPEGs into synset dirs using the standard
  (filename -> synset) mapping file
"""

from __future__ import annotations

import argparse
import os
import shutil
import tarfile
from os.path import join


def prep_train(train_dir: str) -> int:
    """Extract every n*.tar in ``train_dir`` into a same-named directory."""
    n = 0
    for fname in sorted(os.listdir(train_dir)):
        if not fname.endswith(".tar"):
            continue
        synset = fname[: -len(".tar")]
        out = join(train_dir, synset)
        os.makedirs(out, exist_ok=True)
        with tarfile.open(join(train_dir, fname)) as tf:
            tf.extractall(out, filter="data")
        n += 1
    return n


def prep_val(val_dir: str, mapping_file: str) -> int:
    """Move val images into synset dirs.  ``mapping_file`` lines:
    ``ILSVRC2012_val_00000001.JPEG n01751748``."""
    n = 0
    with open(mapping_file) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) != 2:
                continue
            img, synset = parts
            src = join(val_dir, img)
            if not os.path.exists(src):
                continue
            dst_dir = join(val_dir, synset)
            os.makedirs(dst_dir, exist_ok=True)
            shutil.move(src, join(dst_dir, img))
            n += 1
    return n


def main(argv=None):
    p = argparse.ArgumentParser(description="ImageNet dir prep")
    sub = p.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("train")
    t.add_argument("train_dir")
    v = sub.add_parser("val")
    v.add_argument("val_dir")
    v.add_argument("mapping_file")
    args = p.parse_args(argv)
    if args.cmd == "train":
        print(f"extracted {prep_train(args.train_dir)} class archives")
    else:
        print(f"moved {prep_val(args.val_dir, args.mapping_file)} images")


if __name__ == "__main__":
    main()
