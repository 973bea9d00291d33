"""TPU-native good-feature visual SLAM engine.

A brand-new JAX/XLA/Pallas implementation with the capability set of
GF-ORB-SLAM2 (see SURVEY.md): monocular/stereo/RGB-D tracking, local mapping
with good-graph bundle adjustment, loop closing, good-feature active matching,
and multi-index local-map hashing — designed TPU-first (SoA masked arrays,
fixed-capacity jitted kernels, host orchestration instead of threads).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the TPU remote-compile path takes ~90s
# per program; caching compiled executables across processes makes every run
# after the first fast. Opt out with GF_SLAM_COMPILE_CACHE=off.
_cache_dir = _os.environ.get(
    "GF_SLAM_COMPILE_CACHE", _os.path.expanduser("~/.cache/gf_slam_jax")
)
if _cache_dir != "off":
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags
        pass

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
