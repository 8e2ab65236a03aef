"""Second-source cross-check of the PSDS scorer (VERDICT r3 item 6).

psds_eval is not installable in this image, so ``bsed_tpu/eval/psds.py`` is
verified against hand-derived goldens (test_decode_metrics.py). This module
adds an INDEPENDENT implementation written directly from the PSDS paper's
equations (Bilen, Ferroni, Tuveri, Azcarreta, Krstulovic: "A Framework for
the Robust Evaluation of Sound Event Detection", ICASSP 2020, eqs. 1-9) —
naive per-event Python loops, manual interpolation and integration, no
code or helpers shared with eval/psds.py — and cross-checks both on
randomized fixtures including cross-trigger and class-absence edge cases.

Definitions implemented here from the paper:
  * DTC (eq. 1): a detection is valid iff the summed intersection with
    same-class ground truth >= dtc * its own duration.
  * GTC (eq. 2): a ground truth counts as TP iff the summed intersection
    with DTC-valid same-class detections >= gtc * its duration.
  * CTTC (eq. 3 context): a DTC-invalid detection cross-triggers class k
    iff its summed intersection with class-k ground truth >= cttc * its
    duration.
  * FPR_c = FP_c / dataset-duration-in-hours; CTR_{c,k} = CT_{c,k} / T_k
    with T_k class k's total annotated duration in hours (eq. 3).
  * eFPR_c = FPR_c + alpha_ct * mean_{k != c} CTR_{c,k} (eq. 4).
  * PSD-ROC: per-class monotone support curve of TPR_c over eFPR_c through
    (0,0); eTPR(e) = mean_c TPR_c(e) - alpha_st * std_c TPR_c(e) (eq. 9,
    population std), clamped at 0; PSDS = area under eTPR over
    [0, max_efpr] / max_efpr (eqs. 5-8).
"""
import numpy as np
import pandas as pd
import pytest

from bsed_tpu.eval.psds import (compute_psds, evaluate_operating_point)


# --------------------------------------------------------------------------
# the independent implementation (no shared code with eval/psds.py)
# --------------------------------------------------------------------------

def _overlap(a0, a1, b0, b1):
    return max(0.0, min(a1, b1) - max(a0, b0))


def naive_counts(det_rows, gt_rows, classes, dtc, gtc, cttc):
    """det_rows/gt_rows: lists of (filename, label, onset, offset).
    Returns dict with per-class tp, fp, n_ref, gt_dur (seconds) and the
    (C, C) cross-trigger count matrix [detected_as, gt_class]."""
    ci = {c: k for k, c in enumerate(classes)}
    C = len(classes)
    tp = [0] * C
    fp = [0] * C
    n_ref = [0] * C
    gt_dur = [0.0] * C
    ct = [[0] * C for _ in range(C)]

    for f, lbl, on, off in gt_rows:
        n_ref[ci[lbl]] += 1
        gt_dur[ci[lbl]] += off - on

    # DTC per detection
    dtc_valid = []
    for (f, lbl, on, off) in det_rows:
        inter = sum(_overlap(on, off, g_on, g_off)
                    for (gf, g_lbl, g_on, g_off) in gt_rows
                    if gf == f and g_lbl == lbl)
        dur = max(off - on, 1e-12)
        valid = inter / dur >= dtc
        dtc_valid.append(valid)
        if not valid:
            fp[ci[lbl]] += 1
            # cross-trigger counting for the invalid detection
            for k, other in enumerate(classes):
                if other == lbl:
                    continue
                o_inter = sum(_overlap(on, off, g_on, g_off)
                              for (gf, g_lbl, g_on, g_off) in gt_rows
                              if gf == f and g_lbl == other)
                if o_inter / dur >= cttc:
                    ct[ci[lbl]][k] += 1

    # GTC per ground truth
    for (f, lbl, on, off) in gt_rows:
        covered = sum(
            _overlap(on, off, d_on, d_off)
            for valid, (df, d_lbl, d_on, d_off) in zip(dtc_valid, det_rows)
            if valid and df == f and d_lbl == lbl)
        if covered / max(off - on, 1e-12) >= gtc:
            tp[ci[lbl]] += 1

    return {"tp": tp, "fp": fp, "n_ref": n_ref, "gt_dur": gt_dur, "ct": ct}


def naive_psds(per_op_counts, classes, total_duration_s, alpha_ct,
               alpha_st, max_efpr=100.0):
    """PSDS from raw per-operating-point counts, eqs. 3-9."""
    hours = total_duration_s / 3600.0
    C = len(classes)

    # per-class (efpr, tpr) lists over operating points
    curves = []
    for c in range(C):
        pts = [(0.0, 0.0)]
        for cnt in per_op_counts:
            tpr = (cnt["tp"][c] / cnt["n_ref"][c] if cnt["n_ref"][c]
                   else 0.0)
            efpr = cnt["fp"][c] / hours
            if alpha_ct and C > 1:
                ctr_sum = 0.0
                for k in range(C):
                    if k == c:
                        continue
                    t_k_hours = max(cnt["gt_dur"][k] / 3600.0, 1e-12)
                    ctr_sum += cnt["ct"][c][k] / t_k_hours
                efpr += alpha_ct * ctr_sum / (C - 1)
            if efpr <= max_efpr:
                pts.append((efpr, tpr))
        # monotone support curve: sort by efpr, running max of tpr, one
        # point per unique efpr
        pts.sort(key=lambda p: p[0])
        xs, ys, best = [], [], 0.0
        for x, y in pts:
            best = max(best, y)
            if xs and xs[-1] == x:
                ys[-1] = best
            else:
                xs.append(x)
                ys.append(best)
        curves.append((xs, ys))

    # union grid + manual linear interpolation (constant beyond last point)
    grid = sorted({x for xs, _ in curves for x in xs} | {0.0, max_efpr})
    grid = [g for g in grid if g <= max_efpr]

    def interp_at(xs, ys, x):
        if x <= xs[0]:
            return ys[0]
        for i in range(1, len(xs)):
            if x <= xs[i]:
                x0, x1 = xs[i - 1], xs[i]
                y0, y1 = ys[i - 1], ys[i]
                if x1 == x0:
                    return y1
                return y0 + (y1 - y0) * (x - x0) / (x1 - x0)
        return ys[-1]

    etpr = []
    for g in grid:
        vals = [interp_at(xs, ys, g) for xs, ys in curves]
        mean = sum(vals) / C
        var = sum((v - mean) ** 2 for v in vals) / C
        etpr.append(max(0.0, mean - alpha_st * var ** 0.5))

    area = 0.0
    for i in range(1, len(grid)):
        area += 0.5 * (etpr[i] + etpr[i - 1]) * (grid[i] - grid[i - 1])
    return area / max_efpr


# --------------------------------------------------------------------------
# randomized fixtures
# --------------------------------------------------------------------------

def _random_scene(rng, n_files=4, n_classes=5, clip_s=10.0):
    classes = [f"cls{i}" for i in range(n_classes)]
    gt = []
    for f in range(n_files):
        for _ in range(rng.integers(1, 5)):
            c = classes[rng.integers(n_classes)]
            on = float(rng.uniform(0, clip_s * 0.8))
            off = on + float(rng.uniform(0.2, 2.5))
            gt.append((f"f{f}", c, on, min(off, clip_s)))
    return classes, gt


def _detections_for_op(rng, gt, classes, clip_s=10.0, jitter=0.3,
                       miss=0.25, spurious=2.0):
    """Perturbed copies of GT events (DTC-valid-ish) + spurious detections
    (FPs, some overlapping OTHER-class events → cross-triggers)."""
    det = []
    files = sorted({f for f, *_ in gt})
    for (f, c, on, off) in gt:
        if rng.random() < miss:
            continue
        j0 = float(rng.uniform(-jitter, jitter))
        j1 = float(rng.uniform(-jitter, jitter))
        a, b = max(0.0, on + j0), min(clip_s, off + j1)
        if b - a > 0.05:
            det.append((f, c, a, b))
    for f in files:
        for _ in range(rng.poisson(spurious)):
            c = classes[rng.integers(len(classes))]
            on = float(rng.uniform(0, clip_s * 0.9))
            off = on + float(rng.uniform(0.1, 1.5))
            det.append((f, c, on, min(off, clip_s)))
    return det


def _df(rows):
    return pd.DataFrame(rows, columns=["filename", "event_label", "onset",
                                       "offset"])


# --------------------------------------------------------------------------
# agreement tests
# --------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_operating_point_counts_agree(seed):
    rng = np.random.default_rng(seed)
    classes, gt = _random_scene(rng)
    det = _detections_for_op(rng, gt, classes)
    op = evaluate_operating_point(_df(det), _df(gt), 0.5, 0.5, 0.3,
                                  classes=classes)
    naive = naive_counts(det, gt, classes, 0.5, 0.5, 0.3)
    np.testing.assert_array_equal(op.tp, naive["tp"])
    np.testing.assert_array_equal(op.fp, naive["fp"])
    np.testing.assert_array_equal(op.n_ref, naive["n_ref"])
    np.testing.assert_allclose(op.gt_dur, naive["gt_dur"], atol=1e-9)
    np.testing.assert_array_equal(op.ct, np.asarray(naive["ct"]))


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("alphas", [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0),
                                    (0.5, 0.7)])
def test_psds_value_agrees_with_naive_equations(seed, alphas):
    """compute_psds (the psds_eval-style PSD-ROC construction) must equal
    the naive from-the-paper implementation on randomized multi-OP scenes
    incl. cross-triggers, for all three reference (alpha_ct, alpha_st)
    variants + a mixed one."""
    alpha_ct, alpha_st = alphas
    rng = np.random.default_rng(100 + seed)
    classes, gt = _random_scene(rng, n_files=5, n_classes=4)
    total_s = 5 * 10.0

    ops, naive_ops = [], []
    # simulate a threshold sweep: progressively stricter detection sets
    for miss, spurious in ((0.05, 4.0), (0.2, 2.0), (0.4, 1.0),
                           (0.7, 0.3)):
        det = _detections_for_op(rng, gt, classes, miss=miss,
                                 spurious=spurious)
        ops.append(evaluate_operating_point(_df(det), _df(gt), 0.5, 0.5,
                                            0.3, classes=classes))
        naive_ops.append(naive_counts(det, gt, classes, 0.5, 0.5, 0.3))

    ours = compute_psds(ops, total_s, alpha_ct=alpha_ct,
                        alpha_st=alpha_st, max_efpr=100.0).value
    want = naive_psds(naive_ops, classes, total_s, alpha_ct, alpha_st,
                      max_efpr=100.0)
    np.testing.assert_allclose(ours, want, atol=1e-9)


def test_psds_agreement_with_class_absent_from_some_ops():
    """A class detected at some thresholds only (and one with no ground
    truth at all) exercises the class-union alignment path."""
    classes = ["a", "b", "c"]
    gt = [("f0", "a", 1.0, 3.0), ("f0", "b", 5.0, 6.0),
          ("f1", "a", 0.5, 2.0)]
    det_sets = [
        [("f0", "a", 1.1, 2.9), ("f0", "c", 4.0, 4.5),
         ("f1", "a", 0.6, 1.9), ("f0", "b", 5.0, 6.1)],
        [("f0", "a", 1.0, 3.0)],          # b and c vanish at this threshold
        [],                                # nothing detected
    ]
    total_s = 20.0
    ops = [evaluate_operating_point(_df(d), _df(gt), 0.5, 0.5, 0.3,
                                    classes=classes) for d in det_sets]
    naive_ops = [naive_counts(d, gt, classes, 0.5, 0.5, 0.3)
                 for d in det_sets]
    for a_ct, a_st in ((0.0, 0.0), (1.0, 0.0), (0.0, 1.0)):
        ours = compute_psds(ops, total_s, alpha_ct=a_ct, alpha_st=a_st,
                            max_efpr=100.0).value
        want = naive_psds(naive_ops, classes, total_s, a_ct, a_st,
                          max_efpr=100.0)
        np.testing.assert_allclose(ours, want, atol=1e-9, err_msg=str(
            (a_ct, a_st)))


def test_cttc_edge_case_exact_threshold():
    """A DTC-invalid detection whose other-class intersection fraction sits
    EXACTLY at the cttc threshold counts as a cross-trigger (>= semantics),
    on both implementations."""
    classes = ["a", "b"]
    # detection of class a, 1.0s long, overlapping class-b GT for exactly
    # 0.3s (cttc fraction 0.3) and class-a GT for 0.2s (DTC 0.2 < 0.5)
    gt = [("f0", "a", 0.0, 0.2), ("f0", "b", 0.7, 1.2)]
    det = [("f0", "a", 0.0, 1.0)]
    op = evaluate_operating_point(_df(det), _df(gt), 0.5, 0.5, 0.3,
                                  classes=classes)
    naive = naive_counts(det, gt, classes, 0.5, 0.5, 0.3)
    assert op.fp[0] == 1 and naive["fp"][0] == 1
    assert op.ct[0][1] == 1 and naive["ct"][0][1] == 1
