from debiasing_multi_modal_tpu.weights.convert import (  # noqa: F401
    config_from_state_dict,
    load_openai_checkpoint,
    variables_from_state_dict,
)
