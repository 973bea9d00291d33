"""TPU-native good-feature visual SLAM engine.

A brand-new JAX/XLA/Pallas implementation with the capability set of
GF-ORB-SLAM2 (see SURVEY.md): monocular/stereo/RGB-D tracking, local mapping
with good-graph bundle adjustment, loop closing, good-feature active matching,
and multi-index local-map hashing — designed TPU-first (SoA masked arrays,
fixed-capacity jitted kernels, host orchestration instead of threads).
"""

__version__ = "0.1.0"

from gf_orb_slam2_tpu.config import (  # noqa: F401
    CameraConfig,
    ORBConfig,
    TrackingConfig,
    GoodFeatureConfig,
    GoodGraphConfig,
    HashingConfig,
    SystemConfig,
    Sensor,
)
