"""Metric parity against the reference's vendored evaluation forks.

Drives randomized tracking scenarios through the repo's native metrics
(tracklab_tpu/eval/metrics.py) AND the actual vendored reference code:

  * HOTA (+ DetA/AssA/LocA/FragA, per-alpha arrays and TP/FN/FP counts)
    vs plugins/eval/PoseTrack21/posetrack21/.../trackeval/metrics/hota.py
  * CLEAR (MOTA/MOTP/IDSW/FP/FN) and Identity (IDF1/IDP/IDR) vs the
    py-motmetrics fork at plugins/eval/PoseTrack21/posetrack21_mot

plus a full-pipeline "measured HOTA delta": identical synthetic detection
streams through [reference tracker -> reference HOTA] and
[JAX scan tracker -> native HOTA], with the delta asserted ~0 (the
BASELINE ≤0.5-HOTA budget is thereby *measured*, not structural).
"""
import sys
import types

import numpy as np
import pytest

import refbridge
from tracklab_tpu.eval.metrics import (
    make_sequence_data, hota_metrics, clear_metrics, identity_metrics,
)

PT21 = "/root/reference/plugins/eval/PoseTrack21"


def _install_eval_stubs():
    if "shapely" not in sys.modules:
        shapely = types.ModuleType("shapely")
        geom = types.ModuleType("shapely.geometry")
        for n in ("box", "Polygon", "MultiPolygon"):
            setattr(geom, n, type(n, (), {}))
        shapely.geometry = geom
        sys.modules["shapely"] = shapely
        sys.modules["shapely.geometry"] = geom
    if "xmltodict" not in sys.modules:
        x = types.ModuleType("xmltodict")
        x.parse = lambda *a, **k: {}
        x.unparse = lambda *a, **k: ""
        sys.modules["xmltodict"] = x
    for p in (f"{PT21}/posetrack21",
              f"{PT21}/posetrack21_mot/posetrack21_mot"):
        if p not in sys.path:
            sys.path.insert(0, p)


def ref_hota():
    _install_eval_stubs()
    from posetrack21.trackeval.metrics.hota import HOTA
    return HOTA()


def ref_motmetrics():
    _install_eval_stubs()
    import motmetrics as mm
    return mm


# ---------------------------------------------------------------------------
# scenario generator: GT tracks + imperfect tracker output
# ---------------------------------------------------------------------------

def synth_scenario(seed, n_frames=50, n_obj=6, drop=0.2, fp_rate=0.4,
                   switch_prob=0.02, img=(1920, 1080)):
    """Returns ({frame: (gt_ids, gt_ltwh)}, {frame: (pred_ids, pred_ltwh)})
    with localization noise, dropouts, identity switches and FPs."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform([100, 100], [img[0] - 300, img[1] - 300], (n_obj, 2))
    vel = rng.uniform(-6, 6, (n_obj, 2))
    size = rng.uniform(40, 140, (n_obj, 2))
    cur_pred_id = np.arange(n_obj)
    next_pred_id = n_obj
    gt_frames, pred_frames = {}, {}
    for f in range(n_frames):
        pos = pos + vel
        g_ids, g_box, p_ids, p_box = [], [], [], []
        for k in range(n_obj):
            g_ids.append(k)
            g_box.append([pos[k, 0], pos[k, 1], size[k, 0], size[k, 1]])
            if rng.uniform() < drop:
                continue
            if rng.uniform() < switch_prob:
                cur_pred_id[k] = next_pred_id
                next_pred_id += 1
            noise = rng.normal(0, 3, 2)
            p_ids.append(int(cur_pred_id[k]))
            p_box.append([pos[k, 0] + noise[0], pos[k, 1] + noise[1],
                          size[k, 0] * rng.uniform(0.95, 1.05),
                          size[k, 1] * rng.uniform(0.95, 1.05)])
        for _ in range(rng.poisson(fp_rate)):
            c = rng.uniform([0, 0], [img[0] - 200, img[1] - 200])
            p_ids.append(int(next_pred_id))
            next_pred_id += 1
            p_box.append([c[0], c[1], *rng.uniform(30, 120, 2)])
        gt_frames[f] = (np.array(g_ids, int), np.array(g_box, float))
        pred_frames[f] = (np.array(p_ids, int),
                          np.array(p_box, float).reshape(-1, 4))
    return gt_frames, pred_frames


# ---------------------------------------------------------------------------
# HOTA vs the trackeval fork
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_hota_vs_trackeval_fork(seed):
    gt_frames, pred_frames = synth_scenario(seed)
    data = make_sequence_data(gt_frames, pred_frames)
    mine = hota_metrics(data)

    ref_data = {
        "num_timesteps": len(data.gt_ids),
        "num_gt_dets": data.num_gt_dets,
        "num_tracker_dets": data.num_pred_dets,
        "num_gt_ids": data.num_gt_ids,
        "num_tracker_ids": data.num_pred_ids,
        "gt_ids": data.gt_ids,
        "tracker_ids": data.pred_ids,
        "similarity_scores": data.similarity,
    }
    ref = ref_hota().eval_sequence(ref_data)

    np.testing.assert_allclose(mine["HOTA_TP"], ref["HOTA_TP"])
    np.testing.assert_allclose(mine["HOTA_FN"], ref["HOTA_FN"])
    np.testing.assert_allclose(mine["HOTA_FP"], ref["HOTA_FP"])
    np.testing.assert_allclose(mine["HOTA_alpha"], ref["HOTA"],
                               atol=1e-10)
    np.testing.assert_allclose(mine["DetA_alpha"], ref["DetA"],
                               atol=1e-10)
    np.testing.assert_allclose(mine["AssA_alpha"], ref["AssA"],
                               atol=1e-10)
    frag_alpha = mine["FragA_num"] / np.maximum(mine["HOTA_TP"], 1)
    np.testing.assert_allclose(frag_alpha, ref["FragA"], atol=1e-10)
    loca_alpha = (np.maximum(1e-10, mine["LocA_sum"])
                  / np.maximum(1e-10, mine["HOTA_TP"]))
    np.testing.assert_allclose(loca_alpha, ref["LocA"], atol=1e-10)
    assert abs(mine["HOTA"] - float(ref["HOTA"].mean() * 100)) < 1e-9


def test_hota_vs_trackeval_fork_empty_sides():
    gt_frames, pred_frames = synth_scenario(5, n_frames=10)
    empty = {f: (np.zeros(0, int), np.zeros((0, 4))) for f in gt_frames}
    for gt, pred in ((gt_frames, empty), (empty, pred_frames)):
        data = make_sequence_data(gt, pred)
        mine = hota_metrics(data)
        ref_data = {
            "num_timesteps": len(data.gt_ids),
            "num_gt_dets": data.num_gt_dets,
            "num_tracker_dets": data.num_pred_dets,
            "num_gt_ids": data.num_gt_ids,
            "num_tracker_ids": data.num_pred_ids,
            "gt_ids": data.gt_ids,
            "tracker_ids": data.pred_ids,
            "similarity_scores": data.similarity,
        }
        ref = ref_hota().eval_sequence(ref_data)
        np.testing.assert_allclose(mine["HOTA_alpha"], ref["HOTA"])
        np.testing.assert_allclose(mine["HOTA_FN"], ref["HOTA_FN"])
        np.testing.assert_allclose(mine["HOTA_FP"], ref["HOTA_FP"])


# ---------------------------------------------------------------------------
# CLEAR / Identity vs the py-motmetrics fork
# ---------------------------------------------------------------------------

def _mm_iou_dist(gboxes, pboxes, max_iou=0.5):
    """motmetrics.distances.iou_matrix semantics (ltwh boxes, distance =
    1 - IoU, entries above max_iou masked to NaN) — recomputed here only
    because the fork's np.asfarray call was removed in NumPy 2."""
    from tracklab_tpu.eval.metrics import _iou_ltwh

    if len(gboxes) == 0 or len(pboxes) == 0:
        return np.empty((len(gboxes), len(pboxes)))
    d = 1.0 - _iou_ltwh(np.asarray(gboxes, float),
                        np.asarray(pboxes, float))
    return np.where(d > max_iou, np.nan, d)


def run_motmetrics_fork(gt_frames, pred_frames):
    mm = ref_motmetrics()
    acc = mm.MOTAccumulator(auto_id=True)
    for f in sorted(gt_frames):
        gids, gboxes = gt_frames[f]
        pids, pboxes = pred_frames[f]
        dist = _mm_iou_dist(gboxes, pboxes, max_iou=0.5)
        acc.update(gids.tolist(), pids.tolist(), dist)
    mh = mm.metrics.create()
    return mh.compute(
        acc,
        metrics=["num_frames", "mota", "motp", "num_switches",
                 "num_false_positives", "num_misses", "num_matches",
                 "idf1", "idp", "idr", "mostly_tracked", "mostly_lost"],
        return_dataframe=False)


@pytest.mark.parametrize("seed", [0, 3])
def test_clear_identity_vs_motmetrics_fork(seed):
    gt_frames, pred_frames = synth_scenario(seed)
    data = make_sequence_data(gt_frames, pred_frames)
    mine_clear = clear_metrics(data)
    mine_id = identity_metrics(data)
    ref = run_motmetrics_fork(gt_frames, pred_frames)

    assert mine_clear["CLR_FP"] == int(ref["num_false_positives"])
    assert mine_clear["CLR_FN"] == int(ref["num_misses"])
    assert mine_clear["IDSW"] == int(ref["num_switches"])
    np.testing.assert_allclose(mine_clear["MOTA"] / 100,
                               float(ref["mota"]), atol=1e-12)
    # motmetrics MOTP is a *distance* (1 - IoU); trackeval's a similarity
    np.testing.assert_allclose(mine_clear["MOTP"] / 100,
                               1.0 - float(ref["motp"]), atol=1e-12)
    np.testing.assert_allclose(mine_id["IDF1"] / 100, float(ref["idf1"]),
                               atol=1e-12)
    np.testing.assert_allclose(mine_id["IDP"] / 100, float(ref["idp"]),
                               atol=1e-12)
    np.testing.assert_allclose(mine_id["IDR"] / 100, float(ref["idr"]),
                               atol=1e-12)


# ---------------------------------------------------------------------------
# Measured end-to-end HOTA delta:
#   reference tracker + reference eval  vs  JAX tracker + native eval
# ---------------------------------------------------------------------------

def _tracks_to_pred_frames(results):
    """list per frame of (box_ltrb, track_id, cls, conf, ref) tuples ->
    {frame: (ids, ltwh)}."""
    out = {}
    for f, rows in enumerate(results):
        ids = np.array([r[1] for r in rows], int)
        ltwh = np.array([[r[0][0], r[0][1], r[0][2] - r[0][0],
                          r[0][3] - r[0][1]] for r in rows],
                        float).reshape(-1, 4)
        out[f] = (ids, ltwh)
    return out


def _hota_via_fork(gt_frames, pred_frames):
    data = make_sequence_data(gt_frames, pred_frames)
    ref_data = {
        "num_timesteps": len(data.gt_ids),
        "num_gt_dets": data.num_gt_dets,
        "num_tracker_dets": data.num_pred_dets,
        "num_gt_ids": data.num_gt_ids,
        "num_tracker_ids": data.num_pred_ids,
        "gt_ids": data.gt_ids,
        "tracker_ids": data.pred_ids,
        "similarity_scores": data.similarity,
    }
    ref = ref_hota().eval_sequence(ref_data)
    return float(ref["HOTA"].mean() * 100)


def test_measured_hota_delta_ocsort():
    """BASELINE's ≤0.5-HOTA budget, measured: same synthetic detections
    through [ref OC-SORT -> ref HOTA] and [scan OC-SORT -> native HOTA]."""
    from tracklab_tpu.trackers.ocsort import OCSortConfig
    from test_ocsort import synth_stream, run_jax, CFG_KW
    from test_reference_parity import run_ref_ocsort

    # GT = the noiseless object trajectories; reconstruct from the stream
    # generator's determinism by regenerating with drop=0, fp=0, noise via
    # same seed is impractical — instead use the detections themselves as
    # GT identities via their generator: simplest faithful GT is a second
    # clean stream with identical dynamics
    frames = synth_stream(21, n_frames=60, n_obj=6, drop=0.15, fp_rate=0.4)
    clean = synth_stream(21, n_frames=60, n_obj=6, drop=0.0, fp_rate=0.0)
    gt_frames = {}
    for f, rows in enumerate(clean):
        ids = np.arange(len(rows))
        ltwh = np.stack([rows[:, 0], rows[:, 1], rows[:, 2] - rows[:, 0],
                         rows[:, 3] - rows[:, 1]], axis=1)
        gt_frames[f] = (ids, ltwh)

    ref_results = run_ref_ocsort(frames)
    cfg = OCSortConfig(max_tracks=64, max_dets=32, **CFG_KW)
    jax_results = run_jax(frames, cfg)

    hota_ref = _hota_via_fork(gt_frames, _tracks_to_pred_frames(ref_results))
    data = make_sequence_data(gt_frames,
                              _tracks_to_pred_frames(jax_results))
    hota_mine = hota_metrics(data)["HOTA"]
    delta = abs(hota_ref - hota_mine)
    print(f"measured HOTA: ref-pipeline={hota_ref:.4f} "
          f"repo-pipeline={hota_mine:.4f} delta={delta:.6f}")
    assert delta < 0.5, f"HOTA delta {delta} exceeds the 0.5 budget"
    # tracker parity is exact and eval parity is exact, so in fact:
    assert delta < 1e-6


# ---------------------------------------------------------------------------
# Cross-video reid keypoint HOTA vs the fork's HOTAReidKeypoints
# (plugins/eval/PoseTrack21/.../metrics/hota_pose_reid.py)
# ---------------------------------------------------------------------------

def synth_pose_scenario(seed, n_seqs=3, n_frames=12, n_person=4,
                        n_joints=15, drop=0.25, noise=0.15,
                        switch_prob=0.05):
    """Multi-sequence pose streams with GLOBAL person ids: each person
    appears in several sequences (the reid setting), predictions carry
    localization noise, dropped joints, missed dets and id switches."""
    rng = np.random.default_rng(seed)
    seqs = {}
    next_pr = 100
    for s in range(n_seqs):
        frames = []
        present = rng.permutation(n_person)[: rng.integers(2, n_person + 1)]
        base = rng.uniform(100, 900, (n_person, 2))
        pr_of = {int(g): int(g) for g in present}  # pred id per person
        for t in range(n_frames):
            g_ids, g_kps, g_hs, p_ids, p_kps = [], [], [], [], []
            for g in present:
                center = base[g] + rng.normal(0, 5, 2) + t * 2
                kps = center[None, :] + rng.normal(0, 30, (n_joints, 2))
                kps = np.abs(kps) + 1.0  # valid coords are > 0
                vis = rng.uniform(size=n_joints) > 0.15
                kg = kps.copy()
                kg[~vis] = 0.0
                g_ids.append(int(g))
                g_kps.append(kg)
                g_hs.append(rng.uniform(20, 40))
                if rng.uniform() < drop:
                    continue
                if rng.uniform() < switch_prob:
                    pr_of[int(g)] = next_pr
                    next_pr += 1
                kp = kps + rng.normal(0, noise * 30, (n_joints, 2))
                pvis = vis & (rng.uniform(size=n_joints) > 0.1)
                kp[~pvis] = 0.0
                p_ids.append(pr_of[int(g)])
                p_kps.append(np.abs(kp))
            frames.append((
                np.array(g_ids, int),
                np.stack(g_kps) if g_kps else np.zeros((0, n_joints, 2)),
                np.array(g_hs, float),
                np.array(p_ids, int),
                np.stack(p_kps) if p_kps else np.zeros((0, n_joints, 2)),
            ))
        seqs[f"seq{s}"] = frames
    return seqs


def ref_reid_hota(n_joints=15):
    _install_eval_stubs()
    if "tqdm" not in sys.modules:
        tq = types.ModuleType("tqdm")
        tq.tqdm = lambda x, *a, **k: x
        sys.modules["tqdm"] = tq
    from posetrack21.trackeval.metrics.hota_pose_reid import (
        HOTAReidKeypoints,
    )
    return HOTAReidKeypoints(n_joints=n_joints)


@pytest.mark.parametrize("seed", [0, 1])
def test_reid_keypoint_hota_vs_fork(seed):
    from tracklab_tpu.eval.pose_reid_metrics import (
        pckh_distance_matrix, reid_keypoint_hota, relabel_global_ids,
    )

    n_joints = 15
    raw = synth_pose_scenario(seed, n_joints=n_joints)
    seqs, n_gt, n_pr = relabel_global_ids(raw)
    got = reid_keypoint_hota(seqs, n_gt, n_pr, n_joints=n_joints)

    # build the fork's processed_seqs structure
    processed = {}
    total_frames = 0
    for name, frames in seqs.items():
        gt_ids = [f[0] for f in frames]
        tracker_ids = [f[3] for f in frames]
        gt_dets = [np.asarray(f[1], float) for f in frames]
        tracker_dets = [np.asarray(f[4], float) for f in frames]
        kd = [pckh_distance_matrix(g, p, f[2])
              for f, g, p in zip(frames, gt_dets, tracker_dets)]
        num_gt_joints = np.zeros(n_joints, int)
        num_tracker_joints = np.zeros(n_joints, int)
        for g in gt_dets:
            if len(g):
                num_gt_joints += (
                    (g[:, :, 0] > 0) & (g[:, :, 1] > 0)).sum(0)
        for p in tracker_dets:
            if len(p):
                num_tracker_joints += (
                    (p[:, :, 0] > 0) & (p[:, :, 1] > 0)).sum(0)
        processed[name] = {
            "num_timesteps": len(frames),
            "num_gt_dets": int(sum(len(f[0]) for f in frames)),
            "num_tracker_dets": int(sum(len(f[3]) for f in frames)),
            "num_gt_joints": num_gt_joints,
            "num_tracker_joints": num_tracker_joints,
            "gt_ids": gt_ids,
            "tracker_ids": tracker_ids,
            "gt_dets": gt_dets,
            "tracker_dets": tracker_dets,
            "keypoint_distances": kd,
        }
        total_frames += len(frames)
    metric = ref_reid_hota(n_joints)
    want = metric.eval_sequences(processed, np.arange(n_gt),
                                 np.arange(n_pr), total_frames)

    for field in ("HOTA_TP", "HOTA_FN", "HOTA_FP"):
        np.testing.assert_allclose(got[field], want[field], atol=1e-9,
                                   err_msg=field)
    for field in ("HOTA", "DetA", "AssA", "FragA", "LocA", "RHOTA",
                  "FA-HOTA", "DetRe", "DetPr", "AssRe", "AssPr"):
        np.testing.assert_allclose(got[field], want[field], atol=1e-9,
                                   err_msg=field)
    # the fork's HOTA(0) is the per-joint row + its average; ours is the
    # scalar average (the summary value)
    np.testing.assert_allclose(got["HOTA(0)"], want["HOTA(0)"][-1],
                               atol=1e-9)


def test_reid_hota_cross_video_identity_matters():
    """The reid property: consistent person ids across videos score
    higher AssA than per-video ids that differ between videos."""
    from tracklab_tpu.eval.pose_reid_metrics import (
        reid_keypoint_hota, relabel_global_ids,
    )

    n_joints = 15
    rng = np.random.default_rng(3)

    def make(consistent):
        seqs = {}
        for s in range(3):
            frames = []
            for t in range(8):
                kps = np.abs(rng.normal(500, 100, (2, n_joints, 2))) + 1
                ids = np.array([0, 1])
                pid = ids if consistent else ids + 10 * s
                frames.append((ids, kps, np.full(2, 30.0), pid,
                               kps.copy()))
            seqs[f"s{s}"] = frames
        return seqs

    rng = np.random.default_rng(3)
    a = make(True)
    rng = np.random.default_rng(3)
    b = make(False)
    ra = reid_keypoint_hota(*relabel_global_ids(a)[:1],
                            *relabel_global_ids(a)[1:], n_joints=n_joints)
    rb = reid_keypoint_hota(*relabel_global_ids(b)[:1],
                            *relabel_global_ids(b)[1:], n_joints=n_joints)
    assert ra["AssA"][0, -1] > rb["AssA"][0, -1] + 0.2
    # detection accuracy identical — only association differs
    np.testing.assert_allclose(ra["DetA"], rb["DetA"], atol=1e-12)


# ---------------------------------------------------------------------------
# Measured end-to-end HOTA delta for ALL SIX trackers + the pose pipeline
# (VERDICT r4 item 4): test_measured_hota_delta_ocsort measures the
# composed [tracker -> eval] delta for one tracker; these clone the
# harness across the whole suite. Each case reuses the id-for-id parity
# runners from test_reference_parity (same detections into the actual
# reference plugin and the JAX scan tracker) and the same GT both sides,
# so the asserted delta is the full-pipeline composition.
# ---------------------------------------------------------------------------

def _hota_fork_from_data(data):
    ref_data = {
        "num_timesteps": len(data.gt_ids),
        "num_gt_dets": data.num_gt_dets,
        "num_tracker_dets": data.num_pred_dets,
        "num_gt_ids": data.num_gt_ids,
        "num_tracker_ids": data.num_pred_ids,
        "gt_ids": data.gt_ids,
        "tracker_ids": data.pred_ids,
        "similarity_scores": data.similarity,
    }
    return float(ref_hota().eval_sequence(ref_data)["HOTA"].mean() * 100)


def _frames_to_gt(frame_rows):
    """Clean (drop=0, fp=0) stream rows -> {frame: (ids, ltwh)}; with no
    drops the row order is the object order, so per-frame arange ids are
    identity-consistent across frames."""
    gt = {}
    for f, rows in enumerate(frame_rows):
        ids = np.arange(len(rows))
        ltwh = np.stack([rows[:, 0], rows[:, 1], rows[:, 2] - rows[:, 0],
                         rows[:, 3] - rows[:, 1]], axis=1)
        gt[f] = (ids, ltwh)
    return gt


def _case_bytetrack():
    from tracklab_tpu.trackers.bytetrack import ByteTrackConfig
    from test_bytetrack import run_jax as run_jax_bt
    from test_ocsort import synth_stream
    from test_reference_parity import (run_ref_bytetrack, BT_KW,
                                       shift_fwd, shift_back)

    frames = synth_stream(5, n_frames=60)
    gt = _frames_to_gt(synth_stream(5, n_frames=60, drop=0.0, fp_rate=0.0))
    want = run_ref_bytetrack(frames)
    cfg = ByteTrackConfig(max_tracks=64, max_dets=32, **BT_KW)
    got = [shift_back(g) for g in run_jax_bt(shift_fwd(frames), cfg)]
    return gt, want, got, 1e-6


def _case_strongsort():
    from tracklab_tpu.trackers.strongsort import StrongSortConfig
    from test_strongsort import (run_jax as run_jax_ss,
                                 synth_stream_with_emb, E_DIM)
    from test_reference_parity import (run_ref_strongsort, SS_KW,
                                       shift_scene)

    frames, embs = synth_stream_with_emb(0)
    frames = shift_scene(frames, 600.0)
    clean, _ = synth_stream_with_emb(0, drop=0.0, fp_rate=0.0)
    gt = _frames_to_gt(shift_scene(clean, 600.0))
    want = run_ref_strongsort(frames, embs)
    cfg = StrongSortConfig(max_tracks=64, max_dets=16, embed_dim=E_DIM,
                           **SS_KW)
    got = run_jax_ss(frames, embs, cfg)
    # documented quirk: the reference wrapper int-truncates output boxes
    # (_tlwh_to_xyxy), ours keeps floats -> <=1 px box shift moves the
    # per-alpha IoU matching slightly; the delta is bounded, not zero
    return gt, want, got, 0.5


def _case_botsort():
    from tracklab_tpu.trackers.botsort import BotSortConfig
    from test_botsort import run_jax as run_jax_bot
    from test_strongsort import synth_stream_with_emb, E_DIM
    from test_reference_parity import (run_ref_botsort, BS_KW, filter_low,
                                       shift_fwd, shift_back,
                                       normalize_stream_embs)

    frames, embs = synth_stream_with_emb(0, n_frames=50)
    embs = normalize_stream_embs(embs)
    clean, _ = synth_stream_with_emb(0, n_frames=50, drop=0.0, fp_rate=0.0)
    gt = _frames_to_gt(clean)
    want = run_ref_botsort(frames, embs)
    ff, ee = filter_low(frames, embs, BS_KW["track_high_thresh"])
    cfg = BotSortConfig(max_tracks=64, max_dets=16, embed_dim=E_DIM,
                        ema_alpha=0.9, **BS_KW)
    got = [shift_back(g) for g in run_jax_bot(shift_fwd(ff), ee, cfg)]
    return gt, want, got, 1e-6


def _case_deepocsort():
    from tracklab_tpu.trackers.deepocsort import DeepOCSortConfig
    from test_deepocsort import run_jax as run_jax_dos
    from test_strongsort import synth_stream_with_emb, E_DIM
    from test_reference_parity import (run_ref_deepocsort, DOS_KW,
                                       normalize_stream_embs)

    frames, embs = synth_stream_with_emb(4, n_frames=50)
    embs = normalize_stream_embs(embs)
    clean, _ = synth_stream_with_emb(4, n_frames=50, drop=0.0, fp_rate=0.0)
    gt = _frames_to_gt(clean)
    want = run_ref_deepocsort(frames, embs)
    cfg = DeepOCSortConfig(max_tracks=64, max_dets=16, embed_dim=E_DIM,
                           asso_func="iou", **DOS_KW)
    got = run_jax_dos(frames, embs, cfg)
    return gt, want, got, 1e-6


def _case_bpbreid():
    from tracklab_tpu.trackers.bpbreid_strongsort import (
        BPBReIDStrongSortConfig,
    )
    from test_reference_parity import (synth_part_stream, run_ref_bpbreid,
                                       run_jax_bpbreid, BPB_KW, N_PARTS,
                                       PART_E, N_KP)

    frames, feats, viss, kpss = synth_part_stream(0)
    clean, _, _, _ = synth_part_stream(0, drop=0.0)
    gt = _frames_to_gt(clean)
    want = run_ref_bpbreid(frames, feats, viss, kpss)
    cfg = BPBReIDStrongSortConfig(
        motion_criterium="iou", n_parts=N_PARTS, embed_dim=PART_E,
        n_keypoints=N_KP, max_tracks=64, max_dets=16,
        max_kalman_prediction_without_update=7,
        matching_strategy="strong_sort", **BPB_KW)
    got = run_jax_bpbreid(frames, feats, viss, kpss, cfg)
    # boxes agree to 1e-4 px (float32 KF stream both sides) — far inside
    # any 0.05-wide alpha bucket, so the composed delta stays ~0
    return gt, want, got, 1e-3


_TRACKER_CASES = {
    "bytetrack": _case_bytetrack,
    "strongsort": _case_strongsort,
    "botsort": _case_botsort,
    "deepocsort": _case_deepocsort,
    "bpbreid": _case_bpbreid,
}


@pytest.mark.parametrize("name", sorted(_TRACKER_CASES))
def test_measured_hota_delta_all_trackers(name):
    gt, want, got, bound = _TRACKER_CASES[name]()
    hota_ref = _hota_via_fork(gt, _tracks_to_pred_frames(want))
    data = make_sequence_data(gt, _tracks_to_pred_frames(got))
    hota_mine = hota_metrics(data)["HOTA"]
    delta = abs(hota_ref - hota_mine)
    print(f"{name}: measured HOTA ref-pipeline={hota_ref:.4f} "
          f"repo-pipeline={hota_mine:.4f} delta={delta:.6f}")
    assert hota_ref > 20.0, (
        f"{name}: ref pipeline HOTA {hota_ref} — scenario degenerate")
    assert delta < 0.5, (
        f"{name}: HOTA delta {delta} exceeds the 0.5 budget")
    assert delta < bound, (
        f"{name}: HOTA delta {delta} exceeds the expected bound {bound}")


def test_measured_pose_oks_hota_delta():
    """The pose-pipeline composition: same detections+keypoints through
    [reference BPBReID(oks) -> fork HOTA over OKS similarity] and
    [JAX scan tracker -> native OKS-HOTA]."""
    from tracklab_tpu.eval.pose_metrics import make_pose_sequence_data
    from tracklab_tpu.trackers.bpbreid_strongsort import (
        BPBReIDStrongSortConfig,
    )
    from test_reference_parity import (synth_part_stream, run_ref_bpbreid,
                                       run_jax_bpbreid, BPB_KW, N_PARTS,
                                       PART_E, N_KP)

    frames, feats, viss, kpss = synth_part_stream(0)
    want = run_ref_bpbreid(frames, feats, viss, kpss, motion="oks")
    cfg = BPBReIDStrongSortConfig(
        motion_criterium="oks", n_parts=N_PARTS, embed_dim=PART_E,
        n_keypoints=N_KP, max_tracks=64, max_dets=16,
        max_kalman_prediction_without_update=7,
        matching_strategy="strong_sort", **BPB_KW)
    got = run_jax_bpbreid(frames, feats, viss, kpss, cfg, motion="oks")

    kp_by_ref = {}
    for f, kp in zip(frames, kpss):
        for row, k in zip(f, kp):
            kp_by_ref[int(row[6])] = k

    def to_pose_pred(results):
        out = {}
        for f, rows in enumerate(results):
            ids = np.array([r[1] for r in rows], int)
            kps = (np.stack([kp_by_ref[int(r[4])] for r in rows])
                   if rows else np.zeros((0, N_KP, 3)))
            out[f] = (ids, kps)
        return out

    clean, _, _, clean_kpss = synth_part_stream(0, drop=0.0)
    gt = {f: (np.arange(len(k)), k) for f, k in enumerate(clean_kpss)}

    data_ref = make_pose_sequence_data(gt, to_pose_pred(want))
    hota_ref = _hota_fork_from_data(data_ref)
    data_mine = make_pose_sequence_data(gt, to_pose_pred(got))
    hota_mine = hota_metrics(data_mine)["HOTA"]
    delta = abs(hota_ref - hota_mine)
    print(f"pose(oks): measured HOTA ref-pipeline={hota_ref:.4f} "
          f"repo-pipeline={hota_mine:.4f} delta={delta:.6f}")
    assert hota_ref > 20.0
    assert delta < 0.5
    assert delta < 1e-3
