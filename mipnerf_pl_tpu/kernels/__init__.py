from mipnerf_pl_tpu.kernels.ipe import fused_ipe  # noqa: F401
