from sbmc_tpu.train.interface import DenoiserInterface, TrainState  # noqa: F401
from sbmc_tpu.train.checkpointer import Checkpointer  # noqa: F401
from sbmc_tpu.train.trainer import Trainer  # noqa: F401
from sbmc_tpu.train import callbacks  # noqa: F401
