from gf_orb_slam2_tpu.slammap.store import MapStore  # noqa: F401
