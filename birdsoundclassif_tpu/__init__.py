"""birdsoundclassif_tpu — a TPU-native (JAX/XLA/Pallas) framework for the NBM
nocturnal-bird-call detector.

Re-designed from scratch for TPU hardware: fixed-shape fully-traced XLA
programs, NHWC layouts, MXU-friendly matmul DFT front-end, on-device NMS and
RoI pooling, and data-parallel scale-out over a `jax.sharding.Mesh`.

Capability reference: LouisBearing/BirdSoundClassif (mounted read-only); see
SURVEY.md for the component inventory this package implements.
"""

__version__ = "0.1.0"

from .config import NbmConfig, FrontendConfig  # noqa: F401
