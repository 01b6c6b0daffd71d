from vptr_tpu.data.datasets import (  # noqa: F401
    ClipDataset,
    MovingMNISTNpz,
    SyntheticMovingMNIST,
    bair_dataset,
    chop_clips,
    kth_dataset,
)
from vptr_tpu.data.loader import ClipLoader, build_dataset, build_loader  # noqa: F401
from vptr_tpu.data.transforms import (  # noqa: F401
    ClipTransform,
    Normalize,
    ReNormalize,
)
