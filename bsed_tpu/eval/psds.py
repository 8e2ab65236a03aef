"""PSDS-style intersection-criterion scoring with cross-trigger accounting.

psds_eval is not installed here; this module natively implements what the
reference uses it for (/root/reference/src/evaluation_measures.py:505-526):

  * ``compute_macro_f_score`` — per-class F1 at one operating point where
    true positives are defined by the PSDS intersection criteria (Bilen et
    al. 2020) instead of collars:
      - DTC (detection tolerance): a detection is valid when the fraction of
        its duration intersecting same-class ground truth >= dtc_threshold.
      - GTC (ground-truth intersection): a ground-truth event is detected
        when the fraction of its duration covered by DTC-valid detections
        >= gtc_threshold.
    FP = DTC-invalid detections; FN = undetected ground truths.
  * the cross-trigger (CT) confusion matrix — DTC-invalid detections whose
    intersection with OTHER-class ground truth meets cttc_threshold.
  * multi-operating-point PSDS: area under the mean-TPR vs effective-FPR
    curve with cross-trigger (alpha_ct) and across-class-variance (alpha_st)
    penalties, normalized to max_efpr.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd


def _intersections(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise intersection durations between (N,2) and (M,2) intervals."""
    if not len(a) or not len(b):
        return np.zeros((len(a), len(b)))
    lo = np.maximum(a[:, None, 0], b[None, :, 0])
    hi = np.minimum(a[:, None, 1], b[None, :, 1])
    return np.maximum(0.0, hi - lo)


def _by_file_class(df: pd.DataFrame):
    out: Dict[str, Dict[str, np.ndarray]] = {}
    if not len(df):
        return out
    for (fname, label), grp in df.groupby(["filename", "event_label"]):
        out.setdefault(fname, {})[label] = (
            grp[["onset", "offset"]].to_numpy(dtype=np.float64))
    return out


@dataclasses.dataclass
class OperatingPointCounts:
    classes: List[str]
    tp: np.ndarray        # (C,) ground truths detected
    fp: np.ndarray        # (C,) DTC-invalid detections
    n_ref: np.ndarray     # (C,) ground-truth event counts
    ct: np.ndarray        # (C, C) cross-trigger counts [detected_as, gt_class]


def evaluate_operating_point(
    detections: pd.DataFrame,
    ground_truth: pd.DataFrame,
    dtc_threshold: float = 0.5,
    gtc_threshold: float = 0.5,
    cttc_threshold: float = 0.3,
    classes: Optional[Sequence[str]] = None,
) -> OperatingPointCounts:
    if classes is None:
        classes = sorted(set(ground_truth["event_label"].dropna()) |
                         (set(detections["event_label"].dropna())
                          if len(detections) else set()))
    classes = list(classes)
    idx = {c: i for i, c in enumerate(classes)}
    n = len(classes)
    tp = np.zeros(n)
    fp = np.zeros(n)
    n_ref = np.zeros(n)
    ct = np.zeros((n, n))

    det_map = _by_file_class(detections)
    gt_map = _by_file_class(ground_truth)

    for fname, gt_classes in gt_map.items():
        for label, ev in gt_classes.items():
            if label in idx:
                n_ref[idx[label]] += len(ev)

    files = set(det_map) | set(gt_map)
    for fname in files:
        dets = det_map.get(fname, {})
        gts = gt_map.get(fname, {})
        for label, det_ev in dets.items():
            if label not in idx:
                continue
            c = idx[label]
            gt_ev = gts.get(label, np.zeros((0, 2)))
            inter = _intersections(det_ev, gt_ev)        # (ndet, ngt)
            det_dur = det_ev[:, 1] - det_ev[:, 0]
            det_dur = np.maximum(det_dur, 1e-12)
            dtc_frac = inter.sum(axis=1) / det_dur
            dtc_valid = dtc_frac >= dtc_threshold
            fp[c] += int((~dtc_valid).sum())

            if len(gt_ev):
                gt_dur = np.maximum(gt_ev[:, 1] - gt_ev[:, 0], 1e-12)
                covered = inter[dtc_valid].sum(axis=0) / gt_dur
                tp[c] += int((covered >= gtc_threshold).sum())

            # cross-triggers: DTC-invalid detections vs other-class GT
            invalid_ev = det_ev[~dtc_valid]
            if len(invalid_ev):
                for other, o_ev in gts.items():
                    if other == label or other not in idx:
                        continue
                    o_inter = _intersections(invalid_ev, o_ev)
                    frac = o_inter.sum(axis=1) / np.maximum(
                        invalid_ev[:, 1] - invalid_ev[:, 0], 1e-12)
                    ct[c, idx[other]] += int((frac >= cttc_threshold).sum())

    return OperatingPointCounts(classes, tp, fp, n_ref, ct)


def compute_macro_f_score(detections: pd.DataFrame,
                          ground_truth: pd.DataFrame,
                          dtc_threshold: float = 0.5,
                          gtc_threshold: float = 0.5,
                          cttc_threshold: float = 0.3
                          ) -> Tuple[np.ndarray, float, pd.Series]:
    """Mirror of PSDSEval.compute_macro_f_score's return contract used at
    evaluation_measures.py:522-523: (ct_matrix, macro_f1, per_class_f1)."""
    op = evaluate_operating_point(detections, ground_truth, dtc_threshold,
                                  gtc_threshold, cttc_threshold)
    fn = op.n_ref - op.tp
    denom = 2 * op.tp + op.fp + fn
    f1 = np.where(denom > 0, 2 * op.tp / np.maximum(denom, 1), 0.0)
    per_class = pd.Series(f1, index=op.classes)
    return op.ct, float(f1.mean()) if len(f1) else 0.0, per_class


@dataclasses.dataclass
class PSDSResult:
    value: float
    efpr: np.ndarray
    etpr: np.ndarray


def psds_score_report(operating_points: Sequence[OperatingPointCounts],
                      total_duration_s: float) -> Dict[str, float]:
    """The reference's three headline PSDS variants
    (evaluation_measures.py:294-303): (α_ct, α_st) = (0,0), (1,0), (0,1),
    all at max_efpr=100."""
    out = {}
    for name, a_ct, a_st in (("psds_ct0_st0", 0.0, 0.0),
                             ("psds_ct1_st0", 1.0, 0.0),
                             ("psds_ct0_st1", 0.0, 1.0)):
        out[name] = compute_psds(operating_points, total_duration_s,
                                 alpha_ct=a_ct, alpha_st=a_st,
                                 max_efpr=100.0).value
    return out


def compute_psds(
    operating_points: Sequence[OperatingPointCounts],
    total_duration_s: float,
    alpha_ct: float = 0.0,
    alpha_st: float = 0.0,
    max_efpr: float = 100.0,
) -> PSDSResult:
    """PSDS over multiple operating points (evaluation_measures.py:287-315).

    Per OP: class TPR = tp/n_ref; class FPR = fp / dataset-hours; class
    cross-trigger rate averaged over other classes; effective TPR curve =
    mean_c TPR − alpha_st·std_c TPR at effective FPR = FPR + alpha_ct·cTR.
    PSDS = AUC of the upper envelope, normalized by max_efpr.
    """
    hours = total_duration_s / 3600.0
    pts = [(0.0, 0.0)]
    for op in operating_points:
        with np.errstate(divide="ignore", invalid="ignore"):
            tpr = np.where(op.n_ref > 0, op.tp / np.maximum(op.n_ref, 1), 0.0)
        fpr = op.fp / hours
        n = len(op.classes)
        if n > 1:
            ctr = op.ct.sum(axis=1) / (n - 1) / hours
        else:
            ctr = np.zeros(n)
        e_fpr = float(np.mean(fpr + alpha_ct * ctr))
        e_tpr = float(np.mean(tpr) - alpha_st * np.std(tpr))
        pts.append((e_fpr, max(0.0, e_tpr)))

    # operating points beyond max_efpr are inadmissible: their TPR must not
    # be carried into the integration range (it is only achieved at an
    # eFPR the metric excludes)
    pts = [(x, y) for x, y in pts if x <= max_efpr]
    pts.sort()
    # monotone non-decreasing upper envelope (ROC-style)
    xs, ys = [0.0], [0.0]
    best = 0.0
    for x, y in pts:
        best = max(best, y)
        xs.append(x)
        ys.append(best)
    xs.append(max_efpr)
    ys.append(best)
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    order = np.argsort(xs, kind="stable")
    auc = float(np.trapezoid(ys[order], xs[order]))
    return PSDSResult(auc / max_efpr, xs[order], ys[order])
