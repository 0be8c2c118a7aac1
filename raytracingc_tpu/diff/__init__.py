"""Differentiable-rendering utilities: gradient checks and inverse rendering.

The reference renderer has no notion of gradients; this package is the part
of the framework that is genuinely new capability (BASELINE.json's second
metric: "pixel-grad check pass rate"). It provides:

* :mod:`fd_check` — central-finite-difference verification of
  ``jax.grad``-computed scene-parameter gradients, with pass-rate reporting
  (stochastic estimators are made deterministic by fixing the RNG seed; the
  checker accounts for the discrete events — hit/miss, Russian roulette —
  that are legitimately non-differentiable).
* :mod:`optimize` — gradient-descent loops that fit scene parameters
  (albedo, emission, environment, vertices) to target images, single-device
  or sharded over a mesh, with checkpoint/resume.
"""

from raytracingc_tpu.diff.fd_check import fd_check, pixel_grad_check  # noqa: F401
from raytracingc_tpu.diff.optimize import fit_scene  # noqa: F401
