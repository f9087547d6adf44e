"""Frame-for-frame parity against the ACTUAL reference tracker plugins.

Unlike the oracle tests (tests/test_*.py vs tests/oracles/*), which could
share a misreading of the reference with the implementation, these tests
import and run the real plugins from /root/reference/plugins/track (via
tests/refbridge.py, which stubs their missing third-party deps) and assert
id-for-id, box-for-box agreement with the JAX scan trackers on the same
randomized streams.

Documented, deliberate deviations are bridged explicitly where they are
pure input/output reparametrizations:

  * ByteTrack / BoT-SORT center-xywh quirk — the vendored reference feeds
    center-xywh through tlwh-named plumbing (byte_tracker.py:175,191-192;
    bot_sort.py:283-300), so every internal box is the true box shifted by
    (+w/2, +h/2) and the output decode shifts back.  The JAX trackers use
    true boxes; the bridge shifts the input boxes forward and the output
    boxes back, which reproduces the reference data flow exactly (the KF
    is linear in the shift for xywh state, and xyah measurement vectors
    coincide after the shift).
"""
import numpy as np
import pytest
import torch

import refbridge
from test_ocsort import synth_stream, assert_frames_equal, CFG_KW
from test_ocsort import run_jax as run_jax_ocsort
from test_strongsort import synth_stream_with_emb, E_DIM


def to_torch(frame):
    return torch.from_numpy(np.asarray(frame, np.float64))


def normalize_stream_embs(embs):
    out = []
    for e in embs:
        n = np.linalg.norm(e, axis=1, keepdims=True)
        out.append(e / np.where(n > 0, n, 1.0))
    return out


def emb_lookup(frames, embs):
    """dict tracklab ref id -> embedding row."""
    lut = {}
    for f, e in zip(frames, embs):
        for row, emb in zip(f, e):
            lut[int(row[6])] = emb
    return lut


# ---------------------------------------------------------------------------
# OC-SORT
# ---------------------------------------------------------------------------

def run_ref_ocsort(frames, use_byte=False):
    oc = refbridge.make_ref_ocsort(
        det_thresh=CFG_KW["det_thresh"], max_age=CFG_KW["max_age"],
        min_hits=CFG_KW["min_hits"],
        iou_threshold=CFG_KW["iou_threshold"],
        delta_t=CFG_KW["delta_t"], inertia=CFG_KW["inertia"],
        use_byte=use_byte)
    results = []
    for f in frames:
        rows = oc.update(to_torch(f), None)
        results.append([(r[0:4].copy(), int(r[4]), float(r[5]),
                         float(r[6]), int(r[7])) for r in rows])
    return results


@pytest.mark.parametrize("seed", [0, 11])
@pytest.mark.parametrize("use_byte", [False, True])
def test_ocsort_vs_reference(seed, use_byte):
    from tracklab_tpu.trackers.ocsort import OCSortConfig

    frames = synth_stream(seed)
    want = run_ref_ocsort(frames, use_byte=use_byte)
    cfg = OCSortConfig(use_byte=use_byte, max_tracks=64, max_dets=32,
                       **CFG_KW)
    got = run_jax_ocsort(frames, cfg)
    for f, (g, w) in enumerate(zip(got, want)):
        assert_frames_equal(g, w, f)


def test_ocsort_vs_reference_heavy_occlusion():
    from tracklab_tpu.trackers.ocsort import OCSortConfig

    frames = synth_stream(7, n_frames=80, n_obj=4, drop=0.35, fp_rate=0.2)
    want = run_ref_ocsort(frames)
    got = run_jax_ocsort(frames, OCSortConfig(max_tracks=64, max_dets=32,
                                              **CFG_KW))
    for f, (g, w) in enumerate(zip(got, want)):
        assert_frames_equal(g, w, f)


# ---------------------------------------------------------------------------
# ByteTrack (center-xywh quirk bridged, see module docstring)
# ---------------------------------------------------------------------------

def shift_fwd(frames):
    """true ltrb -> the reference's internally-shifted ltrb."""
    out = []
    for f in frames:
        f = f.copy()
        if len(f):
            w = f[:, 2] - f[:, 0]
            h = f[:, 3] - f[:, 1]
            half = np.stack([w / 2, h / 2, w / 2, h / 2], axis=1)
            f[:, :4] = f[:, :4] + half
        out.append(f)
    return out


def shift_back(rows):
    """(box, id, cls, conf, ref) tuples: shifted ltrb -> true ltrb."""
    out = []
    for box, tid, cls_, conf, ref in rows:
        w = box[2] - box[0]
        h = box[3] - box[1]
        out.append((box - np.array([w / 2, h / 2, w / 2, h / 2]),
                    tid, cls_, conf, ref))
    return out


BT_KW = dict(track_thresh=0.5, match_thresh=0.8, track_buffer=12,
             frame_rate=30)


def run_ref_bytetrack(frames):
    bt = refbridge.make_ref_bytetrack(**BT_KW)
    results = []
    for f in frames:
        rows = bt.update(to_torch(f), None)
        results.append([(np.asarray(r[0:4], float), int(r[4]),
                         float(r[5]), float(r[6]), int(r[7]))
                        for r in rows])
    return results


@pytest.mark.parametrize("seed", [0, 5])
def test_bytetrack_vs_reference(seed):
    from tracklab_tpu.trackers.bytetrack import ByteTrackConfig
    from test_bytetrack import run_jax as run_jax_bytetrack

    frames = synth_stream(seed, n_frames=60)
    want = run_ref_bytetrack(frames)
    cfg = ByteTrackConfig(max_tracks=64, max_dets=32, **BT_KW)
    got = run_jax_bytetrack(shift_fwd(frames), cfg)
    got = [shift_back(g) for g in got]
    for f, (g, w) in enumerate(zip(got, want)):
        assert_frames_equal(g, w, f)


# ---------------------------------------------------------------------------
# StrongSORT (precomputed features injected into the reference wrapper)
# ---------------------------------------------------------------------------

def assert_frames_equal_tol(got, want, frame_idx, box_atol):
    got_by_id = {r[1]: r for r in got}
    want_by_id = {r[1]: r for r in want}
    assert set(got_by_id) == set(want_by_id), (
        f"frame {frame_idx}: ids {sorted(got_by_id)} != "
        f"{sorted(want_by_id)}")
    for tid, (box_g, _, cls_g, conf_g, ref_g) in got_by_id.items():
        box_w, _, cls_w, conf_w, ref_w = want_by_id[tid]
        np.testing.assert_allclose(box_g, box_w, atol=box_atol,
                                   err_msg=f"frame {frame_idx} id {tid}")
        assert ref_g == ref_w, f"frame {frame_idx} id {tid} ref"
        np.testing.assert_allclose(conf_g, conf_w, rtol=1e-6)


def shift_scene(frames, offset):
    out = []
    for f in frames:
        f = f.copy()
        if len(f):
            f[:, :4] += offset
        out.append(f)
    return out


SS_KW = dict(max_dist=0.25, max_iou_dist=0.55, max_age=15, n_init=3,
             nn_budget=20, mc_lambda=0.995, ema_alpha=0.9)


def run_ref_strongsort(frames, embs):
    lut = emb_lookup(frames, embs)
    ss = refbridge.make_ref_strongsort(lut, max_unmatched_preds=0, **SS_KW)
    img = np.zeros((4000, 4000, 3), np.uint8)
    results = []
    for f in frames:
        ss._get_features.current_ids = f[:, 6].astype(int)
        rows = ss.update(to_torch(f), img)
        results.append([
            (np.asarray(r[0:4], float), int(r[4]), float(r[5]),
             float(r[6]), int(r[8]))
            for r in rows])
    return results


@pytest.mark.parametrize("seed", [0, 3])
def test_strongsort_vs_reference(seed):
    from tracklab_tpu.trackers.strongsort import StrongSortConfig
    from test_strongsort import run_jax as run_jax_strongsort

    frames, embs = synth_stream_with_emb(seed)
    # the scene is shifted away from the image border: the reference
    # wrapper int-clips output boxes to [0, width-1]
    frames = shift_scene(frames, 600.0)
    want = run_ref_strongsort(frames, embs)
    cfg = StrongSortConfig(max_tracks=64, max_dets=16, embed_dim=E_DIM,
                           **SS_KW)
    got = run_jax_strongsort(frames, embs, cfg)
    for f, (g, w) in enumerate(zip(got, want)):
        # reference output boxes are int-truncated (_tlwh_to_xyxy)
        assert_frames_equal_tol(g, w, f, box_atol=1.0)


# ---------------------------------------------------------------------------
# BoT-SORT (center-xywh quirk bridged; GMC patched to identity; the
# reference's low-score second stage is a no-op — see the degenerate
# tlbr_to_tlwh(center-xywh) conversion at bot_sort.py:397 — so the JAX
# tracker gets the low-score detections filtered out)
# ---------------------------------------------------------------------------

BS_KW = dict(track_high_thresh=0.45, new_track_thresh=0.5, track_buffer=12,
             match_thresh=0.25, proximity_thresh=0.6, appearance_thresh=0.45,
             lambda_=0.985)


def run_ref_botsort(frames, embs):
    lut = emb_lookup(frames, embs)
    bt = refbridge.make_ref_botsort(lut, cmc_method="sparseOptFlow",
                                    frame_rate=30, **BS_KW)
    img = np.zeros((8, 8, 3), np.uint8)
    results = []
    for f in frames:
        keep = f[:, 4] > BS_KW["track_high_thresh"]
        bt._get_features.current_ids = f[keep, 6].astype(int)
        rows = bt.update(to_torch(f), img)
        results.append([(np.asarray(r[0:4], float), int(r[4]),
                         float(r[5]), float(r[6]), int(r[7]))
                        for r in rows])
    return results


def filter_low(frames, embs, thresh):
    ff, ee = [], []
    for f, e in zip(frames, embs):
        keep = f[:, 4] > thresh
        ff.append(f[keep])
        ee.append(e[keep])
    return ff, ee


@pytest.mark.parametrize("seed", [0, 2])
def test_botsort_vs_reference(seed):
    from tracklab_tpu.trackers.botsort import BotSortConfig
    from test_botsort import run_jax as run_jax_botsort

    frames, embs = synth_stream_with_emb(seed, n_frames=50)
    embs = normalize_stream_embs(embs)
    want = run_ref_botsort(frames, embs)
    # low-score dets are inert in the reference (degenerate second-stage
    # boxes never reach IoU > 0.5); drop them for the JAX tracker, whose
    # second stage uses true boxes
    ff, ee = filter_low(frames, embs, BS_KW["track_high_thresh"])
    cfg = BotSortConfig(max_tracks=64, max_dets=16, embed_dim=E_DIM,
                        ema_alpha=0.9, **BS_KW)
    got = run_jax_botsort(shift_fwd(ff), ee, cfg)
    got = [shift_back(g) for g in got]
    for f, (g, w) in enumerate(zip(got, want)):
        assert_frames_equal(g, w, f)


# ---------------------------------------------------------------------------
# Deep-OC-SORT (features + CMC warps injected)
# ---------------------------------------------------------------------------

DOS_KW = dict(det_thresh=0.1, max_age=12, min_hits=2, iou_threshold=0.25,
              delta_t=1, inertia=0.39, w_association_emb=0.75,
              alpha_fixed_emb=0.95, aw_param=0.5)


def run_ref_deepocsort(frames, embs, warps=None):
    lut = emb_lookup(frames, embs)
    holder = {"w": np.eye(2, 3)}
    oc = refbridge.make_ref_deepocsort(
        lut, warp_fn=(lambda: holder["w"]) if warps is not None else None,
        **DOS_KW)
    img = np.zeros((1080, 1920, 3), np.uint8)
    results = []
    for i, f in enumerate(frames):
        keep = f[:, 4] > DOS_KW["det_thresh"]
        oc._get_features.current_ids = f[keep, 6].astype(int)
        if warps is not None:
            holder["w"] = warps[i]
        rows = oc.update(to_torch(f), img)
        results.append([(np.asarray(r[0:4], float), int(r[4]),
                         float(r[5]), float(r[6]), int(r[7]))
                        for r in rows])
    return results


@pytest.mark.parametrize("seed", [0, 4])
def test_deepocsort_vs_reference(seed):
    from tracklab_tpu.trackers.deepocsort import DeepOCSortConfig
    from test_deepocsort import run_jax as run_jax_deepocsort

    frames, embs = synth_stream_with_emb(seed, n_frames=50)
    embs = normalize_stream_embs(embs)
    want = run_ref_deepocsort(frames, embs)
    cfg = DeepOCSortConfig(max_tracks=64, max_dets=16, embed_dim=E_DIM,
                           asso_func="iou", **DOS_KW)
    got = run_jax_deepocsort(frames, embs, cfg)
    for f, (g, w) in enumerate(zip(got, want)):
        assert_frames_equal(g, w, f)


def test_deepocsort_vs_reference_with_cmc():
    from tracklab_tpu.trackers.deepocsort import DeepOCSortConfig
    from test_deepocsort import run_jax as run_jax_deepocsort

    rng = np.random.default_rng(9)
    frames, embs = synth_stream_with_emb(9, n_frames=40, drop=0.25)
    embs = normalize_stream_embs(embs)
    warps = []
    for _ in range(len(frames)):
        ang = rng.normal(0, 0.002)
        t = rng.normal(0, 1.2, 2)
        R = np.array([[np.cos(ang), -np.sin(ang)],
                      [np.sin(ang), np.cos(ang)]])
        warps.append(np.concatenate([R, t[:, None]], axis=1))
    want = run_ref_deepocsort(frames, embs, warps=warps)
    cfg = DeepOCSortConfig(max_tracks=64, max_dets=16, embed_dim=E_DIM,
                           asso_func="iou", **DOS_KW)
    got = run_jax_deepocsort(frames, embs, cfg, warps=warps)
    for f, (g, w) in enumerate(zip(got, want)):
        assert_frames_equal(g, w, f)


# ---------------------------------------------------------------------------
# BPBReID-StrongSORT (part features + visibility + optional keypoints)
# ---------------------------------------------------------------------------

N_PARTS, PART_E, N_KP = 5, 16, 17


def synth_part_stream(seed, n_frames=40, n_obj=5, drop=0.15,
                      img=(1920, 1080)):
    rng = np.random.default_rng(seed)
    pos = rng.uniform([150, 150], [img[0] - 400, img[1] - 400], (n_obj, 2))
    vel = rng.uniform(-6, 6, (n_obj, 2))
    size = rng.uniform(60, 160, (n_obj, 2))
    base_feat = np.abs(rng.normal(size=(n_obj, N_PARTS, PART_E)))
    frames, feats, viss, kpss = [], [], [], []
    ref = 0
    for f in range(n_frames):
        rows, fe, vi, kp = [], [], [], []
        pos = pos + vel
        for k in range(n_obj):
            # object 0 never drops: the reference skips its whole update
            # (incl. mark_missed) on empty frames
            if k > 0 and rng.uniform() < drop:
                continue
            c = pos[k] + rng.normal(0, 2, 2)
            s = size[k]
            rows.append([c[0], c[1], c[0] + s[0], c[1] + s[1],
                         rng.uniform(0.5, 1.0), 1.0, ref])
            fe.append((base_feat[k]
                       + np.abs(rng.normal(0, 0.08, (N_PARTS, PART_E))))
                      .astype(np.float32))
            vi.append(rng.uniform(0.5, 1.0, N_PARTS).astype(np.float32))
            k3 = np.zeros((N_KP, 3), np.float32)
            k3[:, 0] = c[0] + np.linspace(5, s[0] - 5, N_KP) \
                + rng.normal(0, 1, N_KP)
            k3[:, 1] = c[1] + np.linspace(10, s[1] - 10, N_KP)
            k3[:, 2] = 1.0
            kp.append(k3)
            ref += 1
        frames.append(np.array(rows, np.float64).reshape(-1, 7))
        feats.append(np.array(fe, np.float32).reshape(-1, N_PARTS, PART_E))
        viss.append(np.array(vi, np.float32).reshape(-1, N_PARTS))
        kpss.append(np.array(kp, np.float32).reshape(-1, N_KP, 3))
    return frames, feats, viss, kpss


BPB_KW = dict(ema_alpha=0.9, mc_lambda=0.995, max_dist=0.4,
              max_iou_distance=0.7, max_oks_distance=0.7, max_age=12,
              n_init=2)


def run_ref_bpbreid(frames, feats, viss, kpss, motion="iou",
                    strategy="strong_sort_matching"):
    ss = refbridge.make_ref_bpbreid(
        motion_criterium=motion, nn_budget=100, min_bbox_confidence=0.0,
        only_position_for_kf_gating=False,
        max_kalman_prediction_without_update=7,
        matching_strategy=strategy, gating_thres_factor=1,
        w_kfgd=1, w_reid=1, w_st=1, **BPB_KW)
    results = []
    for f, fe, vi, kp in zip(frames, feats, viss, kpss):
        out = ss.update(
            torch.as_tensor(f[:, 6].astype(np.int64)),
            torch.as_tensor(
                np.stack([f[:, 0], f[:, 1], f[:, 2] - f[:, 0],
                          f[:, 3] - f[:, 1]], axis=1)),
            torch.as_tensor(fe), torch.as_tensor(vi),
            torch.as_tensor(f[:, 4]), torch.as_tensor(f[:, 5]),
            frame=None,
            keypoints=torch.as_tensor(kp) if motion == "oks" else None)
        rows = []
        for det_id, row in out.iterrows():
            ltwh = np.asarray(row["track_bbox_kf_ltwh"], float)
            ltrb = np.array([ltwh[0], ltwh[1], ltwh[0] + ltwh[2],
                             ltwh[1] + ltwh[3]])
            rows.append((ltrb, int(row["track_id"]), 1.0,
                         float(f[f[:, 6] == det_id, 4][0]), int(det_id)))
        results.append(rows)
    return results


def run_jax_bpbreid(frames, feats, viss, kpss, cfg, motion="iou"):
    import jax
    import jax.numpy as jnp
    from tracklab_tpu.trackers.bpbreid_strongsort import bpbreid_scan
    from tracklab_tpu.trackers.common import Detections, pad_detections

    dets = [pad_detections(f[:, :4], f[:, 4], f[:, 5], f[:, 6].astype(int),
                           capacity=cfg.max_dets, dtype=np.float64)
            for f in frames]
    stacked = Detections(*[jnp.stack([getattr(d, n) for d in dets])
                           for n in Detections._fields])
    F, D = len(frames), cfg.max_dets
    feat = np.zeros((F, D, N_PARTS, PART_E))
    vis = np.zeros((F, D, N_PARTS))
    kps = np.zeros((F, D, N_KP, 3))
    for f in range(F):
        n = len(feats[f])
        feat[f, :n] = feats[f]
        vis[f, :n] = viss[f]
        kps[f, :n] = kpss[f]
    fn = jax.jit(lambda d, fe, vi, kp: bpbreid_scan(cfg, d, fe, vi, kp))
    _, out = fn(stacked, jnp.asarray(feat), jnp.asarray(vis),
                jnp.asarray(kps))
    res = []
    for f in range(F):
        valid = np.asarray(out.valid[f])
        res.append([
            (np.asarray(out.ltrb[f, t]), int(out.track_id[f, t]),
             float(out.cls[f, t]), float(out.conf[f, t]),
             int(out.ref[f, t]))
            for t in np.nonzero(valid)[0]])
    return res


@pytest.mark.parametrize("motion", ["iou", "oks"])
def test_bpbreid_vs_reference(motion):
    from tracklab_tpu.trackers.bpbreid_strongsort import (
        BPBReIDStrongSortConfig,
    )

    frames, feats, viss, kpss = synth_part_stream(0)
    want = run_ref_bpbreid(frames, feats, viss, kpss, motion=motion)
    cfg = BPBReIDStrongSortConfig(
        motion_criterium=motion, n_parts=N_PARTS, embed_dim=PART_E,
        n_keypoints=N_KP, max_tracks=64, max_dets=16,
        max_kalman_prediction_without_update=7,
        matching_strategy="strong_sort", **BPB_KW)
    got = run_jax_bpbreid(frames, feats, viss, kpss, cfg, motion=motion)
    for f, (g, w) in enumerate(zip(got, want)):
        # ref ids are matched by (ref det id -> track id) mapping below;
        # boxes come from the same float32 feature stream
        assert_frames_equal_tol(g, w, f, box_atol=1e-4)


def test_bpbreid_vs_reference_botsort_strategy():
    from tracklab_tpu.trackers.bpbreid_strongsort import (
        BPBReIDStrongSortConfig,
    )

    frames, feats, viss, kpss = synth_part_stream(3, n_frames=30)
    want = run_ref_bpbreid(frames, feats, viss, kpss,
                           strategy="bot_sort_matching")
    cfg = BPBReIDStrongSortConfig(
        motion_criterium="iou", n_parts=N_PARTS, embed_dim=PART_E,
        n_keypoints=N_KP, max_tracks=64, max_dets=16,
        max_kalman_prediction_without_update=7,
        matching_strategy="bot_sort", **BPB_KW)
    got = run_jax_bpbreid(frames, feats, viss, kpss, cfg)
    for f, (g, w) in enumerate(zip(got, want)):
        assert_frames_equal_tol(g, w, f, box_atol=1e-4)
