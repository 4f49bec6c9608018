from debiasing_multi_modal_tpu.utils.meters import AverageMeter, StepTimer  # noqa: F401
from debiasing_multi_modal_tpu.utils.seed import set_seed  # noqa: F401
