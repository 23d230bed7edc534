"""vcr_gaus_tpu — a TPU-native (JAX/XLA/Pallas) 3D Gaussian Splatting
surface-reconstruction framework with the capabilities of VCR-GauS.

Re-designed TPU-first:
  * differentiable tile rasterizer as a Pallas kernel pair (fwd/bwd) behind
    `jax.custom_vjp`, with MXU-friendly compositing (transmittance as a
    triangular matmul, feature accumulation as a second matmul),
  * fixed-capacity Gaussian population (padded pytrees + masked compaction)
    instead of PyTorch optimizer surgery,
  * jitted train step, host-side schedule loop,
  * scene/camera data parallelism via `jax.sharding.Mesh`.

Reference behavior (capabilities, configs, checkpoint formats) follows
HLinChen/VCR-GauS; see SURVEY.md for the component map.
"""

__version__ = "0.1.0"
