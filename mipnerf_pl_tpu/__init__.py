"""mipnerf_pl_tpu — a TPU-native (JAX/XLA/Pallas) Mip-NeRF framework.

A from-scratch rebuild of the capabilities of hjxwhy/mipnerf_pl (an unofficial
PyTorch-Lightning Mip-NeRF), redesigned TPU-first:

  * all ray math is pure-functional JAX, jit/pjit friendly (static shapes,
    no data-dependent control flow),
  * the hot inner loops (integrated positional encoding, inverse-CDF
    resampling, volumetric compositing) are written to map onto the MXU/VPU
    and are optionally served by Pallas kernels (`mipnerf_pl_tpu.kernels`),
  * data parallelism is expressed with `jax.sharding.Mesh` + NamedSharding
    (XLA collectives over ICI) instead of NCCL/DDP,
  * checkpointing uses orbax, optimization uses optax, the model is Flax.

Layer map (mirrors reference SURVEY.md §1):
  ops/       L0 ray/rendering math            (= reference models/mip.py)
  models/    L1 MLP + MipNerf forward         (= reference models/mip_nerf.py)
  train/     L2 training system               (= reference models/nerf_system.py)
  data/      L3 datasets + host ray pipeline  (= reference datasets/)
  parallel/  Lx device mesh / sharding        (= reference DDPPlugin/NCCL)
  utils/     L5 metrics + visualization       (= reference utils/)
  config.py  L6 flat dotted-key YAML config   (= reference configs/config.py)
"""

__version__ = "0.1.0"


def _respect_env_platform():
    """Make an explicit JAX_PLATFORMS env selection authoritative.

    This image's sitecustomize registers a tunneled TPU PJRT plugin at
    interpreter startup and force-sets the LIVE jax config
    (jax_platforms='axon,cpu'), which silently overrides the user's
    `JAX_PLATFORMS=cpu python train.py ...` — a CPU smoke run would claim
    the single-client TPU grant instead.  Re-assert the env value on the
    live config (harmless everywhere else: config == env already)."""
    import os
    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    try:
        import jax
        if jax.config.jax_platforms != plats:
            jax.config.update("jax_platforms", plats)
    except Exception:  # jax absent/ancient: nothing to fix
        pass


_respect_env_platform()

from mipnerf_pl_tpu.rays import Rays, namedtuple_map  # noqa: F401
