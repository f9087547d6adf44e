"""Independent GS-HOTA oracle (VERDICT r3 item 5).

A second, from-scratch implementation of the game-state HOTA that the
reference evaluates through the external ``sn-trackeval`` package
(reference pyproject.toml:30; eval/trackeval_evaluator.py:70-98 builds
the SoccerNetGS dataset whose similarity is pitch-plane gaussian
distance gated by attribute identity; soccernet_game_state.py:42-51
renames the HOTA outputs to GS-HOTA).

Written in the trackeval fork's accumulator style (spec mirror:
/root/reference/plugins/eval/PoseTrack21/posetrack21/.../metrics/hota.py:
28-156): dict/loop bookkeeping, scipy's Hungarian directly, no shared
code with tracklab_tpu.eval — the same oracle treatment the HOTA/CLEAR
metrics got (tests/test_reference_metric_parity.py).

Input: ``{frame: (ids, positions (N, 2), attrs list-of-dicts)}`` for GT
and predictions, the exact format of eval/gs_evaluator._gs_frames.
"""
from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment

EPS = np.finfo(float).eps
ALPHAS = np.arange(0.05, 0.99, 0.05)


def _similarity(gpos, gattrs, ppos, pattrs, dist_tol, use_roles,
                use_teams, use_jerseys):
    """Pitch-plane gaussian location similarity gated by identity."""
    sim = np.zeros((len(gpos), len(ppos)))
    keys = []
    if use_roles:
        keys.append(("role",))
    if use_teams:
        keys.append(("team",))
    if use_jerseys:
        keys.append(("jersey",))
    for i in range(len(gpos)):
        for j in range(len(ppos)):
            ok = True
            for (k,) in keys:
                if gattrs[i].get(k) != pattrs[j].get(k):
                    ok = False
            if not ok:
                continue
            d2 = ((gpos[i][0] - ppos[j][0]) ** 2
                  + (gpos[i][1] - ppos[j][1]) ** 2)
            sim[i, j] = np.exp(-d2 / (2.0 * dist_tol * dist_tol))
    return sim


def gs_hota_oracle(gt_frames, pred_frames, dist_tol=5.0, use_roles=True,
                   use_teams=True, use_jerseys=True):
    """Compute GS-HOTA per-alpha arrays + scalars, trackeval style."""
    frames = sorted(set(gt_frames) | set(pred_frames))
    empty = (np.zeros(0, int), np.zeros((0, 2)), [])

    # contiguous id remapping in first-appearance order (trackeval's
    # _load_raw preprocessing relabels ids per sequence)
    gid_of, pid_of = {}, {}
    seq = []  # (gids, pids, sim) per frame
    for f in frames:
        gids_raw, gpos, gattrs = gt_frames.get(f, empty)
        pids_raw, ppos, pattrs = pred_frames.get(f, empty)
        for i in gids_raw:
            if i not in gid_of:
                gid_of[i] = len(gid_of)
        for i in pids_raw:
            if i not in pid_of:
                pid_of[i] = len(pid_of)
        gids = [gid_of[i] for i in gids_raw]
        pids = [pid_of[i] for i in pids_raw]
        sim = _similarity(np.asarray(gpos, float).reshape(-1, 2), gattrs,
                          np.asarray(ppos, float).reshape(-1, 2), pattrs,
                          dist_tol, use_roles, use_teams, use_jerseys)
        seq.append((gids, pids, sim))

    n_gt = len(gid_of)
    n_pr = len(pid_of)
    num_gt_dets = sum(len(g) for g, _, _ in seq)
    num_pr_dets = sum(len(p) for _, p, _ in seq)
    A = len(ALPHAS)

    res = {"HOTA_TP": np.zeros(A), "HOTA_FN": np.zeros(A),
           "HOTA_FP": np.zeros(A), "AssA_num": np.zeros(A),
           "LocA_sum": np.zeros(A), "FragA_num": np.zeros(A)}

    def finalize():
        tp, fn, fp = res["HOTA_TP"], res["HOTA_FN"], res["HOTA_FP"]
        det_a = tp / np.maximum(tp + fn + fp, EPS)
        ass_a = res["AssA_num"] / np.maximum(tp, EPS)
        frag_a = res["FragA_num"] / np.maximum(tp, EPS)
        hota = np.sqrt(det_a * ass_a)
        loca = np.maximum(res["LocA_sum"] / np.maximum(tp, EPS), EPS)
        res.update({
            "HOTA_alpha": hota, "DetA_alpha": det_a, "AssA_alpha": ass_a,
            "HOTA": float(hota.mean() * 100),
            "DetA": float(det_a.mean() * 100),
            "AssA": float(ass_a.mean() * 100),
            "LocA": float(loca.mean() * 100),
            "FragA": float(frag_a.mean() * 100),
        })
        return res

    if num_pr_dets == 0:
        res["HOTA_FN"] += num_gt_dets
        return finalize()
    if num_gt_dets == 0:
        res["HOTA_FP"] += num_pr_dets
        return finalize()

    # pass 1: accumulate potential matches (Jaccard-normalized per frame)
    potential = np.zeros((n_gt, n_pr))
    gt_count = np.zeros(n_gt)
    pr_count = np.zeros(n_pr)
    for gids, pids, sim in seq:
        for i, g in enumerate(gids):
            gt_count[g] += 1
            for j, p in enumerate(pids):
                denom = sim[i, :].sum() + sim[:, j].sum() - sim[i, j]
                if denom > EPS:
                    potential[g, p] += sim[i, j] / denom
        for p in pids:
            pr_count[p] += 1

    align = np.zeros((n_gt, n_pr))
    for g in range(n_gt):
        for p in range(n_pr):
            align[g, p] = potential[g, p] / max(
                gt_count[g] + pr_count[p] - potential[g, p], EPS)

    # pass 2: per-frame Hungarian on align*sim; per-alpha thresholding
    matches = [np.zeros((n_gt, n_pr)) for _ in range(A)]
    last = [dict() for _ in range(A)]        # gt -> last matched pred
    frags = [dict() for _ in range(A)]       # (gt, pred) -> [run sizes]
    for gids, pids, sim in seq:
        if not gids:
            for a in range(A):
                res["HOTA_FP"][a] += len(pids)
            continue
        if not pids:
            for a in range(A):
                res["HOTA_FN"][a] += len(gids)
            continue
        score = np.zeros_like(sim)
        for i, g in enumerate(gids):
            for j, p in enumerate(pids):
                score[i, j] = align[g, p] * sim[i, j]
        rows, cols = linear_sum_assignment(-score)
        for a, alpha in enumerate(ALPHAS):
            tp = 0
            for i, j in zip(rows, cols):
                if sim[i, j] < alpha - EPS:
                    continue
                tp += 1
                g, p = gids[i], pids[j]
                matches[a][g, p] += 1
                res["LocA_sum"][a] += sim[i, j]
                if last[a].get(g) != p:
                    last[a][g] = p
                    frags[a].setdefault((g, p), []).append(1)
                else:
                    frags[a][(g, p)][-1] += 1
            res["HOTA_TP"][a] += tp
            res["HOTA_FN"][a] += len(gids) - tp
            res["HOTA_FP"][a] += len(pids) - tp

    for a in range(A):
        for g in range(n_gt):
            for p in range(n_pr):
                m = matches[a][g, p]
                if m == 0:
                    continue
                union = max(gt_count[g] + pr_count[p] - m, EPS)
                res["AssA_num"][a] += m * (m / union)
        for (g, p), sizes in frags[a].items():
            union = max(1.0, gt_count[g] + pr_count[p]
                        - matches[a][g, p])
            res["FragA_num"][a] += sum(s * s for s in sizes) / union
    return finalize()
