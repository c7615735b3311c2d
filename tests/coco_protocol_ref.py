"""Clean-room re-implementation of the COCO keypoint-eval protocol, for
cross-validating detrpose_tpu.data.evaluator.KeypointEvaluator.

pycocotools is not installed in this environment (the reference inlines the
real COCOeval, src/data/coco_eval.py:250-296, but that still imports the
package), so this file is a second, independently structured implementation of
the published protocol semantics:

  * OKS_ig = sum_i exp(-d_i^2 / (2 s^2 var_i)) / #vis  over visible keypoints
    (s^2 = gt area for COCO; 0.53 * box area for CrowdPose use_area=False)
  * per (image, OKS-threshold): detections in descending score order greedily
    take the highest-OKS unmatched GT; matched crowd GTs may be re-matched;
    a match to an ignored GT marks the detection ignored
  * ignored GTs: iscrowd, num_keypoints==0, or area outside the range
  * unmatched detections with area outside the range are ignored in that split
  * accumulate: over all images, score-descending TP/FP cumsums ->
    precision envelope -> 101-point interpolated AP; recall = final TP / #GT
  * maxDets = 20, thresholds 0.50:0.05:0.95

It deliberately does NOT share code or structure with the production
evaluator; agreement between the two on randomized inputs plus hand-derived
exact fixtures (test_eval_protocol.py) is the acceptance check.
"""
from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
MAX_DETS = 20
AREA_RNGS = {"all": (0, 1e10), "medium": (32**2, 96**2), "large": (96**2, 1e10)}


def oks_one(det_xy, det_all, gt, sigmas, use_area):
    """OKS between one detection (K,3) and one GT ann dict."""
    kg = np.asarray(gt["keypoints"], np.float64)
    vis = kg[:, 2] > 0
    if use_area:
        s2 = float(gt["area"])
    else:
        bb = gt["bbox"]
        s2 = float(bb[2] * bb[3]) * 0.53
    s2 += np.spacing(1)
    var = (2.0 * np.asarray(sigmas, np.float64)) ** 2
    if vis.any():
        d2 = (det_xy[:, 0] - kg[:, 0]) ** 2 + (det_xy[:, 1] - kg[:, 1]) ** 2
        e = d2 / var / (2.0 * s2)
        return float(np.exp(-e)[vis].sum() / vis.sum())
    # no visible keypoints: distance to the box expanded by its own size
    bb = np.asarray(gt["bbox"], np.float64)
    x0, x1 = bb[0] - bb[2], bb[0] + 2 * bb[2]
    y0, y1 = bb[1] - bb[3], bb[1] + 2 * bb[3]
    z = np.zeros(det_xy.shape[0])
    dx = np.maximum(z, x0 - det_xy[:, 0]) + np.maximum(z, det_xy[:, 0] - x1)
    dy = np.maximum(z, y0 - det_xy[:, 1]) + np.maximum(z, det_xy[:, 1] - y1)
    e = (dx**2 + dy**2) / var / (2.0 * s2)
    return float(np.exp(-e).mean())


def evaluate(gts, dets, sigmas, use_area=True, img_ids=None):
    """Full protocol; returns {AP, AP50, AP75, AP_medium, AP_large, AR, ...}.

    gts: image_id -> list of ann dicts {keypoints (K,3), area, bbox, iscrowd,
         num_keypoints}; dets: image_id -> list of {score, keypoints (K,3)}.
    """
    if img_ids is None:
        img_ids = sorted(gts.keys())
    T = len(IOU_THRS)

    def det_area(d):
        k = np.asarray(d["keypoints"], np.float64)
        return (k[:, 0].max() - k[:, 0].min()) * (k[:, 1].max() - k[:, 1].min())

    stats = {}
    prec_tables = {}
    rec_tables = {}
    for rng_name, (amin, amax) in AREA_RNGS.items():
        # per-image match records
        records = []  # (score, is_tp[T], is_ignored[T])
        n_gt_used = 0
        any_img = False
        for img in img_ids:
            gt = list(gts.get(img, []))
            dt = sorted(dets.get(img, []), key=lambda d: -d["score"])[:MAX_DETS]
            if not gt and not dt:
                continue
            any_img = True
            gt_ig = []
            for g in gt:
                ig = bool(g.get("iscrowd", 0)) or g.get("num_keypoints", 1) == 0
                a = g.get("area", g["bbox"][2] * g["bbox"][3])
                gt_ig.append(ig or a < amin or a > amax)
            # the greedy matcher's "stop before ignored GTs" break relies on
            # GTs being sorted ignore-last (pycocotools gtind argsort)
            order = sorted(range(len(gt)), key=lambda i: gt_ig[i])
            gt = [gt[i] for i in order]
            gt_ig = [gt_ig[i] for i in order]
            n_gt_used += sum(1 for x in gt_ig if not x)

            # per-threshold greedy matching in score order
            matched = np.zeros((T, len(gt)), bool)
            for d in dt:
                kxy = np.asarray(d["keypoints"], np.float64)[:, :2]
                oks = np.array([
                    oks_one(kxy, d["keypoints"], g, sigmas, use_area)
                    for g in gt])
                tp_t = np.zeros(T, bool)
                ig_t = np.zeros(T, bool)
                for t, thr in enumerate(IOU_THRS):
                    best, best_oks = -1, min(thr, 1 - 1e-10)
                    for gi in range(len(gt)):
                        # matched non-crowd gts are consumed
                        if matched[t, gi] and not gt[gi].get("iscrowd", 0):
                            continue
                        # once we have a real match, don't switch to ignored
                        if best > -1 and not gt_ig[best] and gt_ig[gi]:
                            break
                        if oks[gi] < best_oks:
                            continue
                        best_oks = oks[gi]
                        best = gi
                    if best >= 0:
                        matched[t, best] = True
                        if gt_ig[best]:
                            ig_t[t] = True
                        else:
                            tp_t[t] = True
                    else:
                        # unmatched det outside the area range -> ignored
                        a = det_area(d)
                        if a < amin or a > amax:
                            ig_t[t] = True
                records.append((d["score"], tp_t, ig_t))

        if not any_img or n_gt_used == 0:
            prec_tables[rng_name] = -np.ones((T, len(REC_THRS)))
            rec_tables[rng_name] = -np.ones(T)
            continue
        records.sort(key=lambda r: -r[0])
        prec_tab = -np.ones((T, len(REC_THRS)))
        rec_tab = -np.ones(T)
        for t in range(T):
            tp = np.array([r[1][t] for r in records], np.float64)
            ig = np.array([r[2][t] for r in records], bool)
            tp, fp = tp[~ig], (1.0 - tp[~ig])
            ctp, cfp = np.cumsum(tp), np.cumsum(fp)
            rc = ctp / n_gt_used
            pr = ctp / np.maximum(ctp + cfp, np.spacing(1))
            rec_tab[t] = rc[-1] if rc.size else 0.0
            # envelope + 101-point interpolation
            for i in range(len(pr) - 2, -1, -1):
                pr[i] = max(pr[i], pr[i + 1])
            q = np.zeros(len(REC_THRS))
            idx = np.searchsorted(rc, REC_THRS, side="left")
            ok = idx < len(pr)
            q[ok] = pr[idx[ok]]
            prec_tab[t] = q
        prec_tables[rng_name] = prec_tab
        rec_tables[rng_name] = rec_tab

    def mean_ok(x):
        x = x[x > -1]
        return float(x.mean()) if x.size else -1.0

    p_all = prec_tables["all"]
    stats["AP"] = mean_ok(p_all)
    stats["AP50"] = mean_ok(p_all[0])
    stats["AP75"] = mean_ok(p_all[5])
    stats["AP_medium"] = mean_ok(prec_tables["medium"])
    stats["AP_large"] = mean_ok(prec_tables["large"])
    stats["AR"] = mean_ok(rec_tables["all"])
    stats["AR50"] = mean_ok(rec_tables["all"][0:1])
    stats["AR75"] = mean_ok(rec_tables["all"][5:6])
    stats["AR_medium"] = mean_ok(rec_tables["medium"])
    stats["AR_large"] = mean_ok(rec_tables["large"])
    return stats
