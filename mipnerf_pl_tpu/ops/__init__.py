from mipnerf_pl_tpu.ops.math import (  # noqa: F401
    lift_gaussian,
    conical_frustum_to_gaussian,
    cylinder_to_gaussian,
    cast_rays,
    expected_sin,
    integrated_pos_enc,
    pos_enc,
)
from mipnerf_pl_tpu.ops.sampling import (  # noqa: F401
    sample_along_rays,
    sorted_piecewise_constant_pdf,
    resample_along_rays,
)
from mipnerf_pl_tpu.ops.render import (  # noqa: F401
    volumetric_rendering,
    distloss,
)
