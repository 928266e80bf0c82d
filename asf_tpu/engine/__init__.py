from .train_loop import train
from .test_loop import test
from .eval_loop import eval_epoch

__all__ = ["train", "test", "eval_epoch"]
