from mipnerf_pl_tpu.utils.metrics import (  # noqa: F401
    calc_mse,
    calc_psnr,
    ssim,
    eval_errors,
    summarize_results,
)
