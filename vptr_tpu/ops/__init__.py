from vptr_tpu.ops.window import (  # noqa: F401
    pad_to_window,
    temporal_window_partition,
    temporal_window_reverse,
    unpad_from_window,
    window_partition,
    window_reverse,
)
