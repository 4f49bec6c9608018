from debiasing_multi_modal_tpu.models.clip import (  # noqa: F401
    CLIP,
    create_clip,
    init_clip,
    l2_normalize,
)
from debiasing_multi_modal_tpu.models.config import (  # noqa: F401
    CONFIGS,
    CLIPConfig,
    get_config,
)
from debiasing_multi_modal_tpu.models.resnet import ModifiedResNet  # noqa: F401
from debiasing_multi_modal_tpu.models.text import TextTransformer  # noqa: F401
from debiasing_multi_modal_tpu.models.vit import VisionTransformer  # noqa: F401
