from selavi_tpu.train.optim import make_optimizer, warmup_lr
from selavi_tpu.train.state import TrainState, create_train_state
from selavi_tpu.train.step import make_train_step, make_encode_fn, make_head_logits_fn
from selavi_tpu.train.checkpoint import save_checkpoint, restore_checkpoint

__all__ = [
    "make_optimizer",
    "warmup_lr",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_encode_fn",
    "make_head_logits_fn",
    "save_checkpoint",
    "restore_checkpoint",
]
