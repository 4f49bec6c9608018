from debiasing_multi_modal_tpu.train.config import TrainConfig  # noqa: F401
from debiasing_multi_modal_tpu.train.loop import train_all_epochs  # noqa: F401
