"""Good-graph selection: budget-aware KF subset for local BA.

TPU-native replacement for the SLAM++ good-graph solver (reference:
Thirdparty/SLAM++/include/slam/NonlinearSolver_GoodGraph.h — builds lambda,
Schur-complements landmarks to the pose-only SC matrix (:978-1047), then
LazierGreedy_Selection (:1056) picks the KF subset maximizing logDet via
incremental multi-threaded block Cholesky (:1181-1218); driven from
Optimizer::LocalBundleAdjustment via CBAOptimizer::Find_Subgraph
(Optimizer.cc:1156)).

Here the pose-block Schur complement S comes straight from the batched BA
assembly (optim/local_ba.py einsums), and greedy scoring evaluates ALL
candidates per round with one batched slogdet over mask-collapsed [6K,6K]
matrices — the incremental-Cholesky + thread machinery (SURVEY.md §2.3 P7)
becomes a vmapped dense op.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gf_orb_slam2_tpu.selection.observability import logdet_psd


def masked_logdet(S_blocks, mask, eps=1e-3):
    """logdet of S restricted to selected KFs.

    S_blocks: [K,K,6,6]; mask: [..,K] bool. Unselected rows/cols are zeroed
    and their diagonal set to identity, so the determinant equals that of the
    selected submatrix.
    """
    K = S_blocks.shape[0]
    m = mask.astype(S_blocks.dtype)
    Sm = S_blocks * m[..., :, None, None, None] * m[..., None, :, None, None]
    eyeK = jnp.eye(6, dtype=S_blocks.dtype)
    diag_fix = (1.0 - m)[..., :, None, None] * eyeK
    Sm = Sm.at[..., jnp.arange(K), jnp.arange(K), :, :].add(diag_fix)
    M = jnp.swapaxes(Sm, -3, -2).reshape(mask.shape[:-1] + (K * 6, K * 6))
    return logdet_psd(M, eps)


def select_subgraph(
    S_blocks, free_mask, n_select: int, key, lazier_factor: int = 4,
    always_keep=None, eps: float = 1e-3,
):
    """Greedy Max-logDet selection of `n_select` keyframes.

    S_blocks: [K,K,6,6] pose-Schur information; free_mask: [K] selectable;
    always_keep: [K] bool — pre-selected (e.g. the current KF).
    Returns selected mask [K].
    """
    K = S_blocks.shape[0]
    if always_keep is None:
        always_keep = jnp.zeros(K, bool)
    selected0 = always_keep & free_mask

    def round_fn(carry, k):
        selected = carry
        # lazier: random candidate subset
        u = jax.random.uniform(k, (K,))
        cand = free_mask & ~selected & (u < 1.0 / max(lazier_factor, 1))
        cand = jnp.where(jnp.any(cand), cand, free_mask & ~selected)
        trial_masks = selected[None, :] | (jnp.eye(K, dtype=bool))
        lds = masked_logdet(S_blocks, trial_masks, eps)  # [K]
        score = jnp.where(cand, lds, -jnp.inf)
        best = jnp.argmax(score)
        ok = jnp.isfinite(score[best]) & (jnp.sum(selected) < n_select)
        selected = selected.at[best].set(selected[best] | ok)
        return selected, None

    keys = jax.random.split(key, n_select)
    selected, _ = jax.lax.scan(round_fn, selected0, keys)
    return selected


def estimate_kf_budget(time_budget_ms: float, c3=0.0028, c2=0.0, c1=0.7, c0=2.0) -> int:
    """Budget → subgraph-size predictor (reference: Optimizer::estimateKFNum
    Optimizer.cc:566 — cubic time model t(n) = c3·n³+c2·n²+c1·n+c0 in ms,
    inverted by scan). Coefficients are calibration knobs."""
    n = 2
    while n < 64:
        t = c3 * n**3 + c2 * n**2 + c1 * n + c0
        if t > time_budget_ms:
            break
        n += 1
    return max(2, n - 1)
