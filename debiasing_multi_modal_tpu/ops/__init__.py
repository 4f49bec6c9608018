from debiasing_multi_modal_tpu.ops.attention import (  # noqa: F401
    dot_product_attention,
    multi_head_attention,
)
from debiasing_multi_modal_tpu.ops.quant import (  # noqa: F401
    Int8Dense,
    int8_dense,
)
