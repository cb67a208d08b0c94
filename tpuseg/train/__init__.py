from tpuseg.train.loss import (  # noqa: F401
    cross_entropy_ignore,
    kd_loss,
    seg_loss_from_logprobs,
)
from tpuseg.train.optim import (  # noqa: F401
    make_sgd,
    milestones_for_epochs,
    multistep_schedule,
    poly_schedule,
)
from tpuseg.train.trainer import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_seg_train_step,
    make_cls_train_step,
)
from tpuseg.train.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
from tpuseg.train.rejig import sparsity_aware_reinit  # noqa: F401
from tpuseg.train.unstructured import magnitude_unstructured_masks  # noqa: F401
