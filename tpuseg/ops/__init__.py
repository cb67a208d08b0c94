from tpuseg.ops.upsample import upsample_argmax, upsample8_phase  # noqa: F401
