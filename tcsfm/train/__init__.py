from tcsfm.train.trainer import Trainer, TrainState, create_train_state  # noqa: F401
from tcsfm.train.schedule import halving_schedule  # noqa: F401
from tcsfm.train.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
