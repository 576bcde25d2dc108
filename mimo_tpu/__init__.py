"""mimo_tpu — TPU-native character video synthesis framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of menyifang/MIMO
("Controllable Character Video Synthesis with Spatial Decomposed Modeling"):
pose-driven video diffusion (SD1.5 UNet inflated to video + AnimateDiff-style
motion modules + reference-image attention injection + pose guider), plus the
video-decomposition stack that produces the driving templates.

Design stance (vs the PyTorch reference):
- channels-last layouts everywhere ((B, F, H, W, C)) — native for TPU convs,
- functional models: params are pytrees, forwards are pure jit-able functions,
- the reference's monkey-patched ``ReferenceAttentionControl`` becomes explicit
  dataflow: the reference UNet *returns* its attention banks, the denoising
  UNet *takes* them as inputs,
- the whole denoise loop is one compiled program: windows of the temporal
  context schedule run as a single batched UNet call, overlap-averaging is a
  scatter-add, the step loop is ``lax.scan``,
- multi-chip scaling via ``jax.sharding.Mesh`` + NamedSharding (window-batch
  and frame axes), collectives inserted by XLA.
"""

__version__ = "0.1.0"

from mimo_tpu import config  # noqa: F401
