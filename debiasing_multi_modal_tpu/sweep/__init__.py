from debiasing_multi_modal_tpu.sweep.vmap_loop import train_seeds_vmapped  # noqa: F401
from debiasing_multi_modal_tpu.sweep.runner import run_sweep  # noqa: F401
