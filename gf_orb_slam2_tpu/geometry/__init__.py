from gf_orb_slam2_tpu.geometry import lie, camera, triangulate  # noqa: F401
