from mipnerf_pl_tpu.data.datasets import (  # noqa: F401
    BaseDataset,
    Blender,
    Multicam,
    RealData360,
    dataset_dict,
)
