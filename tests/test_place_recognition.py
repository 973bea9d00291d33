"""Place recognition on REAL image texture: the pretrained vocabulary asset
+ sparse inverted-index KF database must retrieve a revisited place from
distinct views of it (reference validation style: loop detection on real
sequences; fixtures: the reference's in-repo EuRoC/TUM test images,
/root/reference/test — reference: test/test_Stereo.cpp:88-95 uses the same
files)."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

EUROC = "/root/reference/test/EuRoC_l.png"
TUM = "/root/reference/test/TUM_l.png"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(EUROC) and os.path.exists(TUM)),
    reason="reference image fixtures unavailable",
)


def _places(n_per_image=6, w=640, h=480):
    """Distinct 'places' = crops of the two real images with BOUNDED overlap
    (≲35% — different places genuinely look different; heavily-overlapping
    crops are the same place and retrieval between them is undefined); each
    place gets a second, warped view (rotation + scale + brightness)
    simulating a revisit from a slightly different pose."""
    rng = np.random.default_rng(7)
    places = []
    for path in (EUROC, TUM):
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        H, W = img.shape
        n_cols = (n_per_image + 1) // 2
        cw, ch = 320, 300
        for i in range(n_per_image):
            col = i % n_cols
            x0 = int(col * (W - cw) / max(n_cols - 1, 1))
            y0 = 0 if i < n_cols else H - ch  # top row then bottom row
            crop = img[y0: y0 + ch, x0: x0 + cw]
            v0 = cv2.resize(crop, (w, h))
            M = cv2.getRotationMatrix2D((w / 2, h / 2),
                                        rng.uniform(-8, 8),
                                        rng.uniform(0.92, 1.08))
            v1 = cv2.warpAffine(v0, M, (w, h), borderMode=cv2.BORDER_REFLECT)
            v1 = np.clip(v1.astype(np.float32) * rng.uniform(0.8, 1.2),
                         0, 255).astype(np.uint8)
            places.append((v0, v1))
    return places


def test_revisit_retrieval_precision():
    import jax.numpy as jnp

    from gf_orb_slam2_tpu.config import CapacityConfig, ORBConfig
    from gf_orb_slam2_tpu.features.extractor import ORBExtractor
    from gf_orb_slam2_tpu.place.keyframe_db import KeyFrameDatabase
    from gf_orb_slam2_tpu.place.vocabulary import Vocabulary
    from gf_orb_slam2_tpu.slammap.store import MapStore

    asset = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "gf_orb_slam2_tpu", "assets", "vocab10k.npz")
    assert os.path.exists(asset), "vocabulary asset missing"
    voc = Vocabulary.load(asset)
    assert voc.V >= 10000

    places = _places()
    ex = ORBExtractor(ORBConfig(n_features=600), 480, 640)
    n_kp = 1024

    def feats(img):
        f = ex(jnp.asarray(img))
        d = np.zeros((n_kp, 8), np.uint32)
        v = np.zeros(n_kp, bool)
        fv = np.asarray(f.valid)
        d[: fv.size][fv] = np.asarray(f.desc)[fv]
        v[: fv.size] = fv
        return d, v

    store = MapStore(CapacityConfig(max_keyframes=64, max_map_points=1024),
                     n_kp)
    db = KeyFrameDatabase(voc, store)
    for v0, _ in places:
        d, v = feats(v0)
        uv = np.zeros((n_kp, 2), np.float32)
        k = store.add_keyframe(np.eye(3, dtype=np.float32),
                               np.zeros(3, np.float32), uv,
                               np.zeros(n_kp, np.int32),
                               np.zeros(n_kp, np.float32), d,
                               np.full(n_kp, -1.0, np.float32),
                               np.full(n_kp, -1.0, np.float32), v)
        db.add(k)

    correct = 0
    margins = []
    for i, (_, v1) in enumerate(places):
        d, v = feats(v1)
        scores = db.score_query(d, v)
        top = int(np.argmax(scores))
        if top == i:
            correct += 1
            others = np.delete(scores[: len(places)], i)
            margins.append(scores[i] / max(float(others.max()), 1e-9))
    # precision: the revisited place must win for nearly all queries
    # (adjacent crops OVERLAP by construction, so one near-miss is allowed
    # and win margins over the overlapping neighbors stay modest)
    assert correct >= len(places) - 1, f"{correct}/{len(places)} retrieved"
    assert np.median(margins) > 1.03
