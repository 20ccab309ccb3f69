"""geodesic_raytracing_tpu — a TPU-native differentiable geodesic raytracer.

A from-scratch JAX/Pallas framework with the capabilities of the reference
C++/OpenCL "Relativity Workshop" renderer (/root/reference): render any
analytic metric tensor in any coordinate system — black holes, wormholes, warp
drives, cosmic strings — plus differentiable rendering of pixels w.r.t. metric
parameters and camera pose, sharded over TPU pod slices.
"""

__version__ = "0.1.0"

from . import metrics  # noqa: F401  (populates the metric registry)
