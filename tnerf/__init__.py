"""tnerf — TPU-native NeRF training & rendering framework.

A from-scratch JAX / XLA / Pallas / pjit re-design of the capabilities of
owensgroup/rtx_nerf (reference: /root/reference).  Where the reference uses
OptiX RT cores for ray–grid intersection (`rtx/`), tiny-cuda-nn for the
radiance MLP, and hand-written CUDA compositing kernels (`vol_render/`),
this framework uses a Pallas 3D-DDA occupancy-grid traversal kernel, bf16
MXU matmuls + a fused hash-grid encoding, and a differentiable
transmittance scan — all sharded over device meshes with `shard_map`.

Layer map (mirrors SURVEY.md §7.1):
  reference loader/        -> tnerf.data
  reference raygen camera  -> tnerf.cameras
  reference rtx/ (OptiX)   -> tnerf.grid  (occupancy + DDA traversal)
  reference sampler/       -> tnerf.sampling
  reference tiny-cuda-nn   -> tnerf.fields
  reference vol_render/    -> tnerf.render
  reference main.cu loop   -> tnerf.train / tnerf.eval / tnerf.cli
  (absent in reference)    -> tnerf.parallel, tnerf.utils.checkpoint, tests/
"""

__version__ = "0.1.0"

from tnerf import config as config  # noqa: F401
