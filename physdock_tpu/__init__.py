"""PhysDock-TPU: a TPU-native framework for physics-guided all-atom
protein-ligand diffusion docking.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the PhysDock
reference (AlphaFold3-style conditioning trunk + EDM diffusion denoiser with
physics-guided sampling). The compute path is pure JAX (pjit / lax.scan /
Pallas kernels); featurization and IO run host-side in NumPy.

Layering (bottom up):
  utils/     geometry + IO substrate (pure functions)
  ops/       Pallas TPU kernels + XLA fallbacks for the hot ops
  nn/        flax modules: primitives, attention variants, transformer stacks
  model/     PhysDock model, EDM sampler, physics guidance, losses
  data/      host-side featurization (PDB/SDF parsing, CCD, MSA, crops)
  train/     pjit data-parallel training harness (optax + EMA + orbax)
  infer/     redocking / virtual-screening pipelines & ranking
  parallel/  device-mesh and sharding helpers
"""

__version__ = "0.1.0"

from physdock_tpu.config import PhysDockConfig, model_presets  # noqa: F401
