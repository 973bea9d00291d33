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
#
# The dir is keyed by a host-machine fingerprint: XLA:CPU stores AOT
# executables whose cache key does NOT include the compile machine's CPU
# features, so a cache populated on a different host silently serves
# incompatible code ("could lead to execution errors such as SIGILL" —
# observed r4: test_examples_cli SIGABRT + wrong numerics from avx512 AOT
# blobs loaded on a non-avx512 host). TPU entries just live alongside; they
# are invalidated on a host change too, which costs one re-warm per machine.


def _machine_fingerprint() -> str:
    import hashlib
    import platform

    feat = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feat = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    # platform set (env-level; avoids initializing backends at import):
    # axon-relay processes compile SOME XLA:CPU programs on the REMOTE
    # server (its machine features show up in cpu_aot_loader warnings when
    # a local CPU process later loads them) — keep their cache separate
    plat = _os.environ.get("JAX_PLATFORMS", "default")
    raw = f"{platform.machine()}|{_jax.__version__}|{plat}|{feat}"
    return hashlib.sha1(raw.encode()).hexdigest()[:12]


_cache_dir = _os.environ.get(
    "GF_SLAM_COMPILE_CACHE", _os.path.expanduser("~/.cache/gf_slam_jax")
)
if _cache_dir != "off":
    _cache_dir = _os.path.join(_cache_dir, _machine_fingerprint())
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
