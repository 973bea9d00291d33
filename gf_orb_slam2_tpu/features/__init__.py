from gf_orb_slam2_tpu.features.extractor import ORBExtractor, Features  # noqa: F401
