from vptr_tpu.eval.metrics import (  # noqa: F401
    mse_score,
    per_timestep_metrics,
    psnr,
    ssim,
)
