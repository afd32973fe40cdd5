"""jpeg2png_tpu — a TPU-native JPEG smart-decoding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference C tool `jpeg2png` (victorvde/jpeg2png): given a JPEG, find the
smoothest image that re-encodes to exactly the same JPEG, by minimizing

    TV(u) + w * TGV2(u) + p * ||(DCT(u - u0)) / quant||^2

over the convex feasible set Q = { u : DCT(u) in [(k-0.5)q, (k+0.5)q] },
with a FISTA-accelerated projected subgradient method
(reference: compute.c:406-465, README.md:99-116).

Layout:
    ops/       block DCT (MXU matmuls), TV/TGV2 gather-form gradients,
               quantization-box projection, color conversion
    models/    the FISTA projected-subgradient solver as a lax.scan model
    kernels/   Pallas TPU kernels for the fused hot loop
    parallel/  device mesh, striped spatial sharding + halo exchange
    io/        JPEG DCT-coefficient reader (native, libjpeg-backed) and
               PNG writer
    utils/     config, CSV convergence logger, progress reporting
"""

__version__ = "0.1.0"

from jpeg2png_tpu.utils.config import SolverConfig, ChannelSettings  # noqa: F401
