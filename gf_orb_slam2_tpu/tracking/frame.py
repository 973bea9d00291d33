"""Per-frame container (host-side view of device feature arrays).

Replaces the reference's Frame class (src/Frame.cc, include/Frame.h:92-425)
minus the compute: extraction/undistortion/stereo live in features/ and
matching/; the 64x48 feature grid (Frame.h:92) is unnecessary (masked
matrices replace grid pruning). This is a plain record: SoA keypoint arrays,
pose, and the keypoint→map-point association vector.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Frame:
    frame_id: int
    timestamp: float
    uv: np.ndarray        # [N,2] f32 rectified/undistorted pixel coords
    octave: np.ndarray    # [N] i32
    angle: np.ndarray     # [N] f32
    desc: np.ndarray      # [N,8] u32
    response: np.ndarray  # [N] f32
    u_right: np.ndarray   # [N] f32 (<0 mono)
    depth: np.ndarray     # [N] f32 (<0 unknown)
    valid: np.ndarray     # [N] bool
    R: np.ndarray = None  # [3,3] world→cam
    t: np.ndarray = None  # [3]
    mp_ids: np.ndarray = None  # [N] i32 map point per keypoint (-1)
    is_outlier: np.ndarray = None  # [N] bool (pose-opt gating)
    _dev: tuple = None  # device-array cache (tracker._frame_dev)
    _predispatched: tuple = None  # async fused-track handles (System fast path)
    _dev_out: tuple = None  # full frontend device outputs (deferred fetch)

    def __post_init__(self):
        if self.R is None:
            self.R = np.eye(3, dtype=np.float32)
        if self.t is None:
            self.t = np.zeros(3, np.float32)
        if self.uv is not None:
            self._init_assoc()

    def _init_assoc(self):
        n = self.uv.shape[0]
        if self.mp_ids is None:
            self.mp_ids = np.full(n, -1, np.int32)
        if self.is_outlier is None:
            self.is_outlier = np.zeros(n, bool)

    @staticmethod
    def deferred(frame_id, timestamp, dev_out, dev_sub) -> "Frame":
        """Frame whose host arrays are fetched lazily — the tracker batches
        the fetch with its own result transfer (one device sync per frame)."""
        f = Frame(frame_id=frame_id, timestamp=timestamp, uv=None, octave=None,
                  angle=None, desc=None, response=None, u_right=None,
                  depth=None, valid=None)
        f._dev_out = dev_out
        f._dev = dev_sub
        return f

    def fill_host(self, vals):
        """Install fetched (uv, octave, angle, desc, response, valid,
        u_right, depth) host arrays."""
        (self.uv, self.octave, self.angle, self.desc, self.response,
         self.valid, self.u_right, self.depth) = vals
        self._init_assoc()

    def ensure_host(self):
        if self.uv is None and self._dev_out is not None:
            import jax

            self.fill_host(jax.device_get(self._dev_out))

    @property
    def n_kp(self) -> int:
        return int(self.valid.sum())

    @property
    def n_matched(self) -> int:
        return int(((self.mp_ids >= 0) & ~self.is_outlier).sum())

    def center(self) -> np.ndarray:
        return -self.R.T @ self.t

    def pose_matrix(self) -> np.ndarray:
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = self.R
        T[:3, 3] = self.t
        return T
