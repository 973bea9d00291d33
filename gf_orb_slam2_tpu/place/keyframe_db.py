"""Keyframe database: BoW retrieval for loop detection + relocalization.

TPU-native replacement for KeyFrameDatabase (reference:
src/KeyFrameDatabase.cc — inverted index word→KFs, common-word counting,
score accumulation over covisibility groups; DetectLoopCandidates :84,
DetectRelocalizationCandidates :207).

With dense tf-idf vectors (place/vocabulary.py), the inverted index +
common-word prefilter collapse into one [K,V]·[V] matmul per query; the
covisibility-group accumulation logic is kept (host-side, tiny).
"""
from __future__ import annotations

from typing import List

import numpy as np

from gf_orb_slam2_tpu.place.vocabulary import Vocabulary
from gf_orb_slam2_tpu.slammap.store import MapStore


class KeyFrameDatabase:
    def __init__(self, voc: Vocabulary, store: MapStore):
        self.voc = voc
        self.store = store
        K = store.cap.max_keyframes
        self.bow = np.zeros((K, voc.V), np.float32)
        self.present = np.zeros(K, bool)

    def add(self, kf: int):
        s = self.store
        self.bow[kf] = self.voc.bow_vector(s.kf_desc[kf], s.kf_kp_valid[kf])
        self.present[kf] = True

    def erase(self, kf: int):
        self.present[kf] = False
        self.bow[kf] = 0.0

    def score_all(self, query_vec: np.ndarray) -> np.ndarray:
        return self.bow @ query_vec

    def detect_loop_candidates(self, kf: int, min_score: float) -> List[int]:
        """Reference: DetectLoopCandidates (KeyFrameDatabase.cc:84): exclude
        covisible KFs, keep scores ≥ min_score, accumulate scores over
        covisibility groups and return the best KF of each strong group."""
        s = self.store
        connected = set(int(k) for k in s.covisible_kfs(kf))
        connected.add(kf)
        scores = self.score_all(self.bow[kf])
        cand_mask = self.present.copy()
        cand_mask[list(connected)] = False
        cand_mask &= scores >= min_score
        cands = np.nonzero(cand_mask)[0]
        if cands.size == 0:
            return []
        # group score: candidate + its top-10 covisible neighbors
        group_scores = []
        for c in cands:
            group = [int(c)] + [int(x) for x in s.covisible_kfs(int(c), 10)]
            g_sc = sum(scores[g] for g in group if self.present[g] and g not in connected)
            best_in_group = max(
                (g for g in group if self.present[g]), key=lambda g: scores[g]
            )
            group_scores.append((g_sc, int(best_in_group)))
        best_total = max(g for g, _ in group_scores)
        th = 0.75 * best_total
        out = []
        for g_sc, best in group_scores:
            if g_sc >= th and best not in out:
                out.append(best)
        return out

    def detect_reloc_candidates(self, desc, valid) -> List[int]:
        """Reference: DetectRelocalizationCandidates (KeyFrameDatabase.cc:207).
        Returns candidate KFs for a lost frame, best-of-group filtered."""
        q = self.voc.bow_vector(desc, valid)
        scores = self.score_all(q)
        if not self.present.any():
            return []
        order = np.argsort(-scores * self.present)
        top = [int(k) for k in order[:10] if self.present[k] and scores[k] > 0]
        if not top:
            return []
        best = scores[top[0]]
        return [k for k in top if scores[k] >= 0.75 * best]

    def min_covis_score(self, kf: int) -> float:
        """Reference: LoopClosing.cc:136 — min BoW score between kf and its
        covisible neighbors sets the loop-candidate threshold."""
        s = self.store
        neigh = s.covisible_kfs(kf)
        if neigh.size == 0:
            return 0.0
        scores = [float(self.bow[kf] @ self.bow[int(n)]) for n in neigh if self.present[int(n)]]
        return min(scores) if scores else 0.0
