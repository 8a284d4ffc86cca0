from mipnerf_pl_tpu.models.mlp import MLP  # noqa: F401
from mipnerf_pl_tpu.models.mipnerf import MipNerf, LevelOutput  # noqa: F401
