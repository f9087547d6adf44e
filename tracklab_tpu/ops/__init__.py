"""Device-side kernels: box geometry, assignment, Kalman filters, OKS,
embedding distances, NMS. Pure JAX — every function jits, vmaps, and runs
inside ``lax.scan`` tracker bodies."""
from tracklab_tpu.ops import boxes  # noqa: F401
from tracklab_tpu.ops import assignment  # noqa: F401
