from debiasing_multi_modal_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
)
from debiasing_multi_modal_tpu.parallel.tp import (  # noqa: F401
    shard_variables,
    tp_shardings,
    tp_specs,
    validate_tp,
)
from debiasing_multi_modal_tpu.parallel.pp import (  # noqa: F401
    pipeline_transformer,
    pipelined_text_encode,
    pipelined_vit_encode,
    stack_block_params,
    validate_pp,
)
