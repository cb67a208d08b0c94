"""Structured-sparsity mask generators (the reference's pruner family).

Six masker types, JSON-config-compatible with the reference
(``/root/reference/pruners/``, schema examples in ``optimal_configs/``):

- ``block``    — magnitude top-k over bh x bw blocks (BlockPruner.py)
- ``hb``       — hierarchical multi-level blocks (HbPruner.py)
- ``rmb``      — Ramanujan Multi-Blocklet (RmbPruner.py)
- ``rmcdb``    — cyclic-diagonal blocklets (RmcdbPruner.py)
- ``grouping`` — block-diagonal / grouped-conv emulation (GroupingPruner.py)
- ``srmbrep``  — RBGP Kronecker-product masker (SRMBRepMasker.py)

All maskers are pure numpy + an explicit ``np.random.Generator`` (the
reference used the global numpy RNG, making random masks unreproducible
across resume — fixed here).  Masks are generated in the reference's
(OFM, IFM, kh, kw) view and returned in tpuseg's HWIO storage layout.
"""

from tpuseg.sparsity.base import (  # noqa: F401
    Masker,
    apply_masks,
    create_masker,
    mask_sparsity_stats,
)
from tpuseg.sparsity.block import BlockMasker  # noqa: F401
from tpuseg.sparsity.block_regular import BlockRegularMasker  # noqa: F401
from tpuseg.sparsity.grouping import GroupingMasker  # noqa: F401
from tpuseg.sparsity.hb import HbMasker  # noqa: F401
from tpuseg.sparsity.rmb import RmbMasker  # noqa: F401
from tpuseg.sparsity.rmcdb import RmcdbMasker  # noqa: F401
from tpuseg.sparsity.srmbrep import SRMBRepMasker  # noqa: F401
from tpuseg.sparsity import patterns  # noqa: F401
from tpuseg.sparsity import formats  # noqa: F401
