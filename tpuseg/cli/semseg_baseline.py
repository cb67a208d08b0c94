"""Dense baseline segmentation trainer.

Parity with /root/reference/semseg_baseline.py — the same pipeline as
semantic_seg without the pruner framework (default arch drn_d_54, crop 512;
semseg_baseline.py:614-616).  Optionally applies 50% random unstructured
pruning like the reference's ``prune.random_unstructured`` arm
(semseg_baseline.py:752).

Thin front-end over tpuseg.cli.semantic_seg with pruning disabled.
"""

from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and not argv[0].startswith("-"):
        cmd, rest = argv[0], argv[1:]
    else:
        cmd, rest = "train", argv
    if "--arch" not in rest:
        rest += ["--arch", "drn_d_54"]
    # strip pruner flags if any slipped in
    banned = {"--mc-pruning", "--pr-static", "--rejig"}
    out = []
    skip_next = False
    for a in rest:
        if skip_next:
            skip_next = False
            continue
        if a in banned:
            continue
        if a == "--pr-config-path":
            skip_next = True
            continue
        out.append(a)
    from tpuseg.cli.semantic_seg import main as seg_main

    seg_main([cmd] + out)


if __name__ == "__main__":
    main()
