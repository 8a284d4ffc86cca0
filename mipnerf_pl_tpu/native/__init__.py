from mipnerf_pl_tpu.native.gather import (  # noqa: F401
    gather_multi,
    native_available,
)
