from vptr_tpu.utils.misc import (  # noqa: F401
    AverageMeters,
    count_params,
    set_seed,
    transformer_step_flops,
    window_attention_flops,
)
