"""tpuseg — TPU-native video-segmentation + model-compression framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch codebase `thejasvi-konduru/video-seg-model-compress` (RBGP structured
sparsity for DRN semantic segmentation):

- ``tpuseg.models``    — DRN backbones + DRNSeg head + CIFAR zoo (functional, pytree params)
- ``tpuseg.sparsity``  — the pruner/masker family (block, hb, rmb, rmcdb, grouping, srmbrep)
- ``tpuseg.ops``       — TPU compute path: convs, fused upsample+argmax, Pallas block-sparse kernels
- ``tpuseg.train``     — jitted train/eval steps, SGD+MultiStepLR, KD, checkpointing
- ``tpuseg.parallel``  — device mesh + sharding (replaces DataParallel/DDP/NCCL)
- ``tpuseg.data``      — Cityscapes lists + paired transforms (pure numpy/PIL)
- ``tpuseg.video``     — video segmentation pipeline (decode -> device -> fused inference)
- ``tpuseg.metrics``   — fast_hist / mIoU / accuracy / meters
- ``tpuseg.tools``     — spectral gap, sparsity stats, shape/FLOP extraction

Everything under the compute path is pure-functional and jit-compatible; the
parameter container is a flat ``{torch-style-name: array}`` dict so the
reference's shipped JSON pruning configs (``optimal_configs/*.json``) apply
verbatim.
"""

__version__ = "0.1.0"
