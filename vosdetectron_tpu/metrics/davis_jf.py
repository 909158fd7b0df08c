"""DAVIS J&F evaluation (region similarity + boundary F-measure).

Rebuild of the fork's vendored davis2017-evaluation semantics
(reference: fork-added DAVIS eval, SURVEY.md §2.2 Tier C: db_eval_iou,
db_eval_boundary — bipartite boundary match via morphological dilation).

Protocol (DAVIS-2017 semi-supervised):
  * per object: J (mask IoU) and F (boundary F-measure) per frame,
    averaged over frames EXCLUDING the first and last;
  * J&F = mean over objects of (mean J + mean F) / 2.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def mask_iou(pred: np.ndarray, gt: np.ndarray) -> float:
    """db_eval_iou semantics: empty∩empty -> 1.0."""
    inter = np.logical_and(pred, gt).sum()
    union = np.logical_or(pred, gt).sum()
    if union == 0:
        return 1.0
    return float(inter) / float(union)


def _seg2bmap(seg: np.ndarray) -> np.ndarray:
    """Boundary map: pixels whose 4-neighbourhood crosses the mask edge."""
    seg = seg.astype(bool)
    e = np.zeros_like(seg)
    s = np.zeros_like(seg)
    e[:, :-1] = seg[:, 1:]
    s[:-1, :] = seg[1:, :]
    b = (seg ^ e) | (seg ^ s)
    b[:, -1] |= seg[:, -1]
    b[-1, :] |= seg[-1, :]
    return b & seg | (b & ~seg)  # boundary pixels on either side


def _bipartite_boundary_counts(fg: np.ndarray, gb: np.ndarray,
                               radius: float):
    """One-to-one boundary correspondence (the original BSDS
    `correspond_pixels` semantics): maximum bipartite matching between
    pred and gt boundary pixels under a Euclidean distance cap. Returns
    the number of matched pairs. The dilation shortcut (official
    davis2017-evaluation python code) allows many-to-one matches and so
    upper-bounds this."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import maximum_bipartite_matching
    from scipy.spatial import cKDTree

    p_xy = np.argwhere(fg)
    g_xy = np.argwhere(gb)
    if not len(p_xy) or not len(g_xy):
        return 0
    pairs = cKDTree(p_xy).query_ball_tree(cKDTree(g_xy), r=radius)
    rows = np.concatenate([np.full(len(js), i, np.int32)
                           for i, js in enumerate(pairs)]) \
        if any(len(js) for js in pairs) else np.zeros((0,), np.int32)
    cols = np.concatenate([np.asarray(js, np.int32) for js in pairs]) \
        if len(rows) else np.zeros((0,), np.int32)
    if not len(rows):
        return 0
    graph = csr_matrix((np.ones(len(rows), np.int8), (rows, cols)),
                       shape=(len(p_xy), len(g_xy)))
    match = maximum_bipartite_matching(graph, perm_type="column")
    return int((match >= 0).sum())


def boundary_f_measure(pred: np.ndarray, gt: np.ndarray,
                       bound_th: float = 0.008,
                       exact: bool = False) -> float:
    """db_eval_boundary: precision/recall of boundary pixels within a
    tolerance radius (0.008 * image diagonal).

    exact=False (default) uses dilation matching — the official
    davis2017-evaluation python implementation's semantics (many-to-one
    matches allowed). exact=True runs the original BSDS one-to-one
    bipartite matching, which is stricter; measured delta on synthetic
    sequences is <= ~0.02 F for clean single boundaries and grows with
    fragmented/doubled boundaries (see tests/test_data_metrics.py)."""
    import cv2

    pred = pred.astype(bool)
    gt = gt.astype(bool)
    if not pred.any() and not gt.any():
        return 1.0
    if not pred.any() or not gt.any():
        return 0.0

    h, w = pred.shape
    radius = max(1, int(np.ceil(bound_th * np.sqrt(h * h + w * w))))
    fg = _seg2bmap(pred)
    gb = _seg2bmap(gt)
    n_fg = fg.sum()
    n_gb = gb.sum()

    if exact:
        m = _bipartite_boundary_counts(fg, gb, radius)
        precision = m / n_fg if n_fg else 1.0
        recall = m / n_gb if n_gb else 1.0
    else:
        kernel = cv2.getStructuringElement(
            cv2.MORPH_ELLIPSE, (2 * radius + 1, 2 * radius + 1))
        fg_dil = cv2.dilate(fg.astype(np.uint8), kernel).astype(bool)
        gb_dil = cv2.dilate(gb.astype(np.uint8), kernel).astype(bool)
        precision = (fg & gb_dil).sum() / n_fg if n_fg else 1.0
        recall = (gb & fg_dil).sum() / n_gb if n_gb else 1.0
    if precision + recall == 0:
        return 0.0
    return float(2 * precision * recall / (precision + recall))


def evaluate_sequence(pred_idmaps: Sequence[np.ndarray],
                      gt_idmaps: Sequence[np.ndarray],
                      object_ids: Sequence[int] | None = None
                      ) -> Dict[str, float]:
    """Per-sequence J&F over indexed id maps (T frames each).

    Frames 0 and T-1 are excluded per DAVIS protocol.
    """
    assert len(pred_idmaps) == len(gt_idmaps)
    t = len(gt_idmaps)
    if object_ids is None:
        object_ids = sorted(
            int(i) for i in np.unique(gt_idmaps[0]) if i != 0)
    inner = range(1, t - 1) if t > 2 else range(t)

    j_means, f_means = [], []
    for oid in object_ids:
        js, fs = [], []
        for fr in inner:
            p = pred_idmaps[fr] == oid
            g = gt_idmaps[fr] == oid
            js.append(mask_iou(p, g))
            fs.append(boundary_f_measure(p, g))
        j_means.append(float(np.mean(js)) if js else 0.0)
        f_means.append(float(np.mean(fs)) if fs else 0.0)

    j = float(np.mean(j_means)) if j_means else 0.0
    f = float(np.mean(f_means)) if f_means else 0.0
    return {"J": j, "F": f, "J&F": (j + f) / 2.0,
            "per_object_J": j_means, "per_object_F": f_means}


def evaluate_dataset(per_seq_results: Dict[str, Dict[str, float]]
                     ) -> Dict[str, float]:
    """Aggregate over sequences (mean of per-sequence means)."""
    js = [r["J"] for r in per_seq_results.values()]
    fs = [r["F"] for r in per_seq_results.values()]
    j = float(np.mean(js)) if js else 0.0
    f = float(np.mean(fs)) if fs else 0.0
    return {"J": j, "F": f, "J&F": (j + f) / 2.0}
