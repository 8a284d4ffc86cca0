from mipnerf_pl_tpu.train.schedule import mip_lr_decay  # noqa: F401
from mipnerf_pl_tpu.train.system import MipNeRFSystem  # noqa: F401
