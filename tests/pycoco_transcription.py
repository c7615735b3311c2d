"""Third referee for the AP evaluator: a faithful transcription of
pycocotools' COCOeval restricted to iouType='keypoints', single category.

Unlike tests/coco_protocol_ref.py (a clean-room re-derivation of the protocol)
this module transcribes the *canonical published algorithms* of
pycocotools/cocoeval.py (cocodataset/cocoapi, v2.0) step by step — computeOks,
evaluateImg's greedy matcher with the crowd re-match rule, accumulate's
mergesort tie-breaking and precision envelope, _summarizeKps — plus
COCO.loadRes's detection-area fabrication from the keypoint extent. It
therefore decorrelates from the author's protocol *reading*: anywhere the two
local implementations share a misreading, this transcription disagrees.

The per-image evaluation loop itself is NOT run from here: the test drives the
reference repo's inlined print-free copy of COCOeval.evaluate
(src/data/coco_eval.py:250-296) against this object, so the orchestration comes
from the reference verbatim.
"""
import copy

import numpy as np


class Params:
    """pycocotools Params.setKpParams (cocoeval.py:527-539)."""

    def __init__(self, kpt_sigmas):
        self.imgIds = []
        self.catIds = [1]
        self.iouThrs = np.linspace(
            0.5, 0.95, int(np.round((0.95 - 0.5) / 0.05)) + 1, endpoint=True)
        self.recThrs = np.linspace(
            0.0, 1.00, int(np.round((1.00 - 0.0) / 0.01)) + 1, endpoint=True)
        self.maxDets = [20]
        self.areaRng = [[0 ** 2, 1e5 ** 2], [32 ** 2, 96 ** 2],
                        [96 ** 2, 1e5 ** 2]]
        self.areaRngLbl = ["all", "medium", "large"]
        self.useCats = 1
        self.useSegm = None
        self.iouType = "keypoints"
        self.kpt_oks_sigmas = np.asarray(kpt_sigmas, np.float64)


class MiniCOCOeval:
    """COCOeval (keypoints) transcription over plain GT/DT dicts.

    gts: {image_id: [ann, ...]} with ann = {keypoints (K,3), area, bbox,
    iscrowd, num_keypoints}; dets: {image_id: [{score, keypoints (K,3)}, ...]}.
    """

    def __init__(self, gts, dets, kpt_sigmas):
        self.params = Params(kpt_sigmas)
        self.params.imgIds = sorted(gts.keys())
        self._raw_gts = gts
        self._raw_dets = dets
        self.evalImgs = []
        self.eval = {}
        self.ious = {}

    # -- COCO.loadRes keypoint-result fabrication (coco.py:318-325): the
    # detection's area/bbox come from the raw keypoint extent (all coords,
    # visibility not consulted), ids are 1-based over the whole result list.
    def _load_res(self):
        anns = []
        rid = 0
        for img in self.params.imgIds:
            for d in self._raw_dets.get(img, []):
                kp = np.asarray(d["keypoints"], np.float64).reshape(-1)
                x, y = kp[0::3], kp[1::3]
                x0, x1, y0, y1 = x.min(), x.max(), y.min(), y.max()
                rid += 1
                anns.append({
                    "image_id": img, "category_id": 1, "id": rid,
                    "score": float(d["score"]),
                    "keypoints": kp.tolist(),
                    "area": (x1 - x0) * (y1 - y0),
                    "bbox": [x0, y0, x1 - x0, y1 - y0],
                })
        return anns

    # -- COCOeval._prepare (cocoeval.py:75-106). NOTE the canonical quirk:
    # an explicit 'ignore' field is overwritten by the iscrowd flag.
    def _prepare(self):
        gts, gid = [], 0
        for img in self.params.imgIds:
            for g in self._raw_gts.get(img, []):
                gid += 1
                gg = copy.deepcopy(g)
                gg["image_id"], gg["category_id"], gg["id"] = img, 1, gid
                gg["keypoints"] = np.asarray(
                    gg["keypoints"], np.float64).reshape(-1).tolist()
                gts.append(gg)
        dts = self._load_res()
        for gt in gts:
            gt["ignore"] = gt["ignore"] if "ignore" in gt else 0
            gt["ignore"] = "iscrowd" in gt and gt["iscrowd"]
            if self.params.iouType == "keypoints":
                gt["ignore"] = (gt["num_keypoints"] == 0) or gt["ignore"]
        from collections import defaultdict

        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        for gt in gts:
            self._gts[gt["image_id"], gt["category_id"]].append(gt)
        for dt in dts:
            self._dts[dt["image_id"], dt["category_id"]].append(dt)

    # -- COCOeval.computeOks (cocoeval.py:203-238)
    def computeOks(self, imgId, catId):
        p = self.params
        gts = self._gts[imgId, catId]
        dts = self._dts[imgId, catId]
        inds = np.argsort([-d["score"] for d in dts], kind="mergesort")
        dts = [dts[i] for i in inds]
        if len(dts) > p.maxDets[-1]:
            dts = dts[0:p.maxDets[-1]]
        if len(gts) == 0 or len(dts) == 0:
            return []
        ious = np.zeros((len(dts), len(gts)))
        sigmas = p.kpt_oks_sigmas
        vars = (sigmas * 2) ** 2
        k = len(sigmas)
        for j, gt in enumerate(gts):
            g = np.array(gt["keypoints"])
            xg, yg, vg = g[0::3], g[1::3], g[2::3]
            k1 = np.count_nonzero(vg > 0)
            bb = gt["bbox"]
            x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
            y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
            for i, dt in enumerate(dts):
                d = np.array(dt["keypoints"])
                xd, yd = d[0::3], d[1::3]
                if k1 > 0:
                    dx = xd - xg
                    dy = yd - yg
                else:
                    z = np.zeros((k))
                    dx = np.max((z, x0 - xd), axis=0) + np.max((z, xd - x1), axis=0)
                    dy = np.max((z, y0 - yd), axis=0) + np.max((z, yd - y1), axis=0)
                e = (dx ** 2 + dy ** 2) / vars / (gt["area"] + np.spacing(1)) / 2
                if k1 > 0:
                    e = e[vg > 0]
                ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
        return ious

    # -- COCOeval.evaluateImg (cocoeval.py:255-318)
    def evaluateImg(self, imgId, catId, aRng, maxDet):
        gts = self._gts[imgId, catId]
        dts = self._dts[imgId, catId]
        if len(gts) == 0 and len(dts) == 0:
            return None
        for g in gts:
            if g["ignore"] or (g["area"] < aRng[0] or g["area"] > aRng[1]):
                g["_ignore"] = 1
            else:
                g["_ignore"] = 0
        gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
        gts = [gts[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
        dts = [dts[i] for i in dtind[0:maxDet]]
        iscrowd = [int(o["iscrowd"]) for o in gts]
        ious = (self.ious[imgId, catId][:, gtind]
                if len(self.ious[imgId, catId]) > 0 else self.ious[imgId, catId])
        p = self.params
        T = len(p.iouThrs)
        G = len(gts)
        D = len(dts)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gts])
        dtIg = np.zeros((T, D))
        if not len(ious) == 0:
            for tind, t in enumerate(p.iouThrs):
                for dind, d in enumerate(dts):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gts):
                        # already matched gt, not a crowd -> cannot match again
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        # dt matched a non-ignore gt and now only ignore gts
                        # remain -> stop
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gts[m]["id"]
                    gtm[tind, m] = d["id"]
        # unmatched dets outside the area range are ignored, not FPs
        a = np.array([d["area"] < aRng[0] or d["area"] > aRng[1]
                      for d in dts]).reshape((1, len(dts)))
        dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "image_id": imgId, "category_id": catId, "aRng": aRng,
            "maxDet": maxDet,
            "dtIds": [d["id"] for d in dts],
            "gtIds": [g["id"] for g in gts],
            "dtMatches": dtm, "gtMatches": gtm,
            "dtScores": [d["score"] for d in dts],
            "gtIgnore": gtIg, "dtIgnore": dtIg,
        }

    # -- COCOeval.accumulate (cocoeval.py:320-389)
    def accumulate(self):
        p = self.params
        T = len(p.iouThrs)
        R = len(p.recThrs)
        K = len(p.catIds)
        A = len(p.areaRng)
        M = len(p.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        scores = -np.ones((T, R, K, A, M))
        _pe = self._paramsEval
        I0 = len(_pe.imgIds)
        A0 = len(_pe.areaRng)
        for k, k0 in enumerate(range(K)):
            Nk = k0 * A0 * I0
            for a, a0 in enumerate(range(A0)):
                Na = a0 * I0
                for m, maxDet in enumerate(p.maxDets):
                    E = [self.evalImgs[Nk + Na + i] for i in range(I0)]
                    E = [e for e in E if e is not None]
                    if len(E) == 0:
                        continue
                    dtScores = np.concatenate(
                        [e["dtScores"][0:maxDet] for e in E])
                    inds = np.argsort(-dtScores, kind="mergesort")
                    dtScoresSorted = dtScores[inds]
                    dtm = np.concatenate(
                        [e["dtMatches"][:, 0:maxDet] for e in E], axis=1)[:, inds]
                    dtIg = np.concatenate(
                        [e["dtIgnore"][:, 0:maxDet] for e in E], axis=1)[:, inds]
                    gtIg = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dtIg))
                    fps = np.logical_and(np.logical_not(dtm),
                                         np.logical_not(dtIg))
                    tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        tp = np.array(tp)
                        fp = np.array(fp)
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        ss = np.zeros((R,))
                        if nd:
                            recall[t, k, a, m] = rc[-1]
                        else:
                            recall[t, k, a, m] = 0
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds2 = np.searchsorted(rc, p.recThrs, side="left")
                        try:
                            for ri, pi in enumerate(inds2):
                                q[ri] = pr[pi]
                                ss[ri] = dtScoresSorted[pi]
                        except Exception:
                            pass
                        precision[t, :, k, a, m] = np.array(q)
                        scores[t, :, k, a, m] = np.array(ss)
        self.eval = {
            "counts": [T, R, K, A, M],
            "precision": precision,
            "recall": recall,
            "scores": scores,
        }

    # -- COCOeval._summarizeKps (cocoeval.py:464-482)
    def summarize(self):
        p = self.params

        def _summarize(ap=1, iouThr=None, areaRng="all", maxDets=20):
            aind = [i for i, lbl in enumerate(p.areaRngLbl) if lbl == areaRng]
            mind = [i for i, mDet in enumerate(p.maxDets) if mDet == maxDets]
            if ap == 1:
                s = self.eval["precision"]
                if iouThr is not None:
                    t = np.where(iouThr == p.iouThrs)[0]
                    s = s[t]
                s = s[:, :, :, aind, mind]
            else:
                s = self.eval["recall"]
                if iouThr is not None:
                    t = np.where(iouThr == p.iouThrs)[0]
                    s = s[t]
                s = s[:, :, aind, mind]
            if len(s[s > -1]) == 0:
                return -1.0
            return float(np.mean(s[s > -1]))

        return {
            "AP": _summarize(1),
            "AP50": _summarize(1, iouThr=0.5),
            "AP75": _summarize(1, iouThr=0.75),
            "AP_medium": _summarize(1, areaRng="medium"),
            "AP_large": _summarize(1, areaRng="large"),
            "AR": _summarize(0),
            "AR50": _summarize(0, iouThr=0.5),
            "AR75": _summarize(0, iouThr=0.75),
            "AR_medium": _summarize(0, areaRng="medium"),
            "AR_large": _summarize(0, areaRng="large"),
        }
