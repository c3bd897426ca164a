"""vistracker_tpu — a TPU-native (JAX/XLA/Pallas) framework for visibility-aware
human-object interaction tracking from a single RGB camera.

Re-designed from scratch for TPU hardware with the capabilities of the
VisTracker reference (CVPR'23): SMPL-T pre-fitting, SmoothNet temporal
smoothing, triplane rendering, SIF-Net neural distance fields, HVOP-Net
motion infilling, joint human-object optimization, and evaluation.

Subpackages
-----------
core      : pure-function geometry — rotations, cameras, SMPL-H LBS, priors
ops       : TPU compute primitives — grid sampling, chamfer, rasterization
models    : flax.linen networks — hourglass, SIF-Net, SmoothNet, infillers
fit       : jit-compiled optimization loops (SMPL-T fit, joint fit, generator)
data      : host-side input pipeline and the packed-pkl data contract
eval      : metrics (Chamfer/v2v/accel) and the windowed-Procrustes evaluator
parallel  : device-mesh sharding utilities (frame-axis SPMD, halo exchange)
render    : triplane orthographic renderer and silhouette rasterizer
"""

__version__ = "0.1.0"
