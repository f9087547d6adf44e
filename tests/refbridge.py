"""Bridge to the actual reference tracker plugins (/root/reference/plugins).

The parity tests (test_reference_parity.py) drive the *real* reference
tracker classes — not hand-written oracles — on the same randomized
detection streams as the JAX scan trackers, asserting id-for-id,
box-for-box agreement.  The reference code is executed READ-ONLY as a
test oracle.

The container lacks several of the reference's third-party deps; minimal
stubs are installed into sys.modules before importing the plugins.  Each
stub reproduces exactly the semantics the reference call sites rely on:

  * ``ultralytics.utils.ops.xyxy2xywh/xywh2xyxy`` — box format flips
    (byte_tracker.py:3, bot_sort.py uses the same pair).
  * ``lap.lapjv`` — Jonker-Volgenant with ``extend_cost``/``cost_limit``
    semantics (byte_track/matching.py:41, oc_sort/association.py:190).
    Emulated via scipy's linear_sum_assignment on the same extended
    square matrix the lap package builds internally, so the
    matched/unmatched sets are identical whenever the optimum is unique
    (parity streams use continuous random costs, so ties have measure
    zero).
  * ``torchreid.metrics.distance.compute_distance_matrix_using_bp_features``
    — part-based distance used by bpbreid_strong_sort/sort/
    nn_matching.py:126: per-part *squared* Euclidean distances
    (torchreid's 'euclidean' metric is euclidean_squared_distance),
    combined as the visibility-score-weighted mean over parts; returns
    ``(pairwise_dist, per_part_dist)``.  With L2-normalized non-negative
    features the combined distance lies in [0, 2] — matching the
    in-reference comment at nn_matching.py:128.
  * ``gdown``, ``torchvision`` — import-time placeholders only; the ReID
    backbones are monkeypatched out and the tests feed precomputed
    embeddings (the same arrays given to the JAX trackers).
"""
from __future__ import annotations

import sys
import types

import numpy as np

_REF_TRACK = "/root/reference/plugins/track"


# ---------------------------------------------------------------------------
# stubs
# ---------------------------------------------------------------------------

def _np_or_torch_copy(x):
    return x.clone() if hasattr(x, "clone") else x.copy()


def _xywh2xyxy(x):
    y = _np_or_torch_copy(x)
    y[..., 0] = x[..., 0] - x[..., 2] / 2
    y[..., 1] = x[..., 1] - x[..., 3] / 2
    y[..., 2] = x[..., 0] + x[..., 2] / 2
    y[..., 3] = x[..., 1] + x[..., 3] / 2
    return y


def _xyxy2xywh(x):
    y = _np_or_torch_copy(x)
    y[..., 0] = (x[..., 0] + x[..., 2]) / 2
    y[..., 1] = (x[..., 1] + x[..., 3]) / 2
    y[..., 2] = x[..., 2] - x[..., 0]
    y[..., 3] = x[..., 3] - x[..., 1]
    return y


def _lapjv(cost, extend_cost=False, cost_limit=np.inf, return_cost=True):
    """lap.lapjv-compatible solver (see module docstring)."""
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost, dtype=float)
    n_rows, n_cols = cost.shape
    if cost_limit < np.inf:
        n = n_rows + n_cols
        ext = np.full((n, n), cost_limit / 2.0)
        ext[n_rows:, n_cols:] = 0.0
        ext[:n_rows, :n_cols] = cost
    elif n_rows != n_cols:
        if not extend_cost:
            raise ValueError("rectangular cost needs extend_cost=True")
        n = max(n_rows, n_cols)
        ext = np.full((n, n), cost.max() + 1.0 if cost.size else 1.0)
        ext[:n_rows, :n_cols] = cost
    else:
        ext = cost
    rows, cols = linear_sum_assignment(ext)
    x = np.full(n_rows, -1, dtype=np.int64)
    y = np.full(n_cols, -1, dtype=np.int64)
    for r, c in zip(rows, cols):
        if r < n_rows and c < n_cols:
            x[r] = c
            y[c] = r
    matched = np.nonzero(x >= 0)[0]
    opt = float(cost[matched, x[matched]].sum())
    if return_cost:
        return opt, x, y
    return x, y


def _bp_distance(qf, gf, qf_vis, gf_vis, use_gpu=False, **kw):
    import torch

    # qf (Q, P, D), gf (N, P, D), qf_vis (Q, P), gf_vis (N, P)
    q = qf.permute(1, 0, 2).double()            # (P, Q, D)
    g = gf.permute(1, 0, 2).double()            # (P, N, D)
    d = (q.pow(2).sum(-1).unsqueeze(-1) + g.pow(2).sum(-1).unsqueeze(1)
         - 2.0 * q @ g.transpose(1, 2))         # (P, Q, N) squared euclid
    d = d.clamp(min=0.0)
    w = (qf_vis.t().double().unsqueeze(-1)
         * gf_vis.t().double().unsqueeze(1))    # (P, Q, N)
    combined = (d * w).sum(0) / w.sum(0).clamp(min=1e-12)
    return combined, d


def _reshape_z(z, dim_z, ndim):
    """filterpy.common.reshape_z semantics: ensure z is (dim_z, 1), then
    squeeze to the state's ndim."""
    z = np.atleast_2d(z)
    if z.shape[1] == dim_z:
        z = z.T
    if z.shape != (dim_z, 1):
        raise ValueError(
            f"z (shape {z.shape}) must be convertible to shape ({dim_z}, 1)")
    if ndim == 1:
        z = z[:, 0]
    if ndim == 0:
        z = z[0, 0]
    return z


def _logpdf(x, mean=None, cov=1, allow_singular=True):
    from scipy.stats import multivariate_normal

    if mean is not None:
        mean = np.asarray(mean).flatten()
    x = np.asarray(x).flatten()
    return multivariate_normal.logpdf(x, mean, cov, allow_singular)


def install_stubs():
    if "filterpy" not in sys.modules:
        fp = types.ModuleType("filterpy")
        fps = types.ModuleType("filterpy.stats")
        fpc = types.ModuleType("filterpy.common")
        fps.logpdf = _logpdf
        fpc.reshape_z = _reshape_z
        fpc.pretty_str = lambda label, arr: f"{label} = {arr}"
        fp.stats = fps
        fp.common = fpc
        sys.modules.update({"filterpy": fp, "filterpy.stats": fps,
                            "filterpy.common": fpc})

    if "lap" not in sys.modules:
        lap = types.ModuleType("lap")
        lap.lapjv = _lapjv
        sys.modules["lap"] = lap

    if "ultralytics" not in sys.modules:
        u = types.ModuleType("ultralytics")
        uu = types.ModuleType("ultralytics.utils")
        uo = types.ModuleType("ultralytics.utils.ops")
        uc = types.ModuleType("ultralytics.utils.checks")
        uo.xywh2xyxy = _xywh2xyxy
        uo.xyxy2xywh = _xyxy2xywh
        uc.check_requirements = lambda *a, **k: None
        uc.check_version = lambda *a, **k: True
        import logging
        uu.LOGGER = logging.getLogger("ultralytics-stub")
        uu.ops = uo
        uu.checks = uc
        u.utils = uu
        sys.modules.update({
            "ultralytics": u, "ultralytics.utils": uu,
            "ultralytics.utils.ops": uo, "ultralytics.utils.checks": uc,
        })

    if "gdown" not in sys.modules:
        g = types.ModuleType("gdown")
        g.download = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("gdown stub must never be called"))
        sys.modules["gdown"] = g

    if "torchvision" not in sys.modules:
        import importlib.machinery
        tv = types.ModuleType("torchvision")
        # a real ModuleSpec so importlib.util.find_spec (used by e.g.
        # transformers' availability checks) doesn't choke; the metadata
        # lookup still fails, so torchvision reads as NOT installed
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tvt = types.ModuleType("torchvision.transforms")
        tvt.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision.transforms", None)
        for name in ("Resize", "ToTensor", "Normalize", "Compose",
                     "InterpolationMode"):
            setattr(tvt, name, type(name, (), {"__init__":
                                               lambda self, *a, **k: None}))
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt

    if "torchreid" not in sys.modules:
        tr = types.ModuleType("torchreid")
        trm = types.ModuleType("torchreid.metrics")
        trd = types.ModuleType("torchreid.metrics.distance")
        trd.compute_distance_matrix_using_bp_features = _bp_distance

        def _cdm(x, y, metric="euclidean"):
            import torch
            d = (x.pow(2).sum(1, keepdim=True) + y.pow(2).sum(1) -
                 2.0 * x @ y.t())
            return d.clamp(min=0.0)

        trm.compute_distance_matrix = _cdm
        trm.distance = trd
        tr.metrics = trm
        sys.modules.update({"torchreid": tr, "torchreid.metrics": trm,
                            "torchreid.metrics.distance": trd})

    if _REF_TRACK not in sys.path:
        sys.path.insert(0, _REF_TRACK)


# ---------------------------------------------------------------------------
# reference tracker factories (all monkeypatch the ReID/GMC machinery so
# precomputed embeddings/warps can be injected per frame)
# ---------------------------------------------------------------------------

class _NoReid:
    """Placeholder for ReIDDetectMultiBackend — never does inference."""

    def __init__(self, *a, **k):
        pass


def make_ref_ocsort(**kw):
    install_stubs()
    import oc_sort.ocsort as m
    return m.OCSort(**kw)


def make_ref_bytetrack(**kw):
    install_stubs()
    import byte_track.byte_tracker as m
    m.BaseTrack._count = 0
    return m.BYTETracker(**kw)


def make_ref_botsort(features_lookup, **kw):
    """features_lookup: dict tracklab_id -> embedding (np, unit-norm)."""
    install_stubs()
    import bot_sort.bot_sort as m
    orig = m.ReIDDetectMultiBackend
    m.ReIDDetectMultiBackend = _NoReid
    try:
        bt = m.BoTSORT(model_weights=None, device="cpu", fp16=False, **kw)
    finally:
        m.ReIDDetectMultiBackend = orig
    bt.gmc.apply = lambda img, dets: np.eye(2, 3)

    import torch

    def _get_features(dets_xywh, img):
        ids = _get_features.current_ids
        if len(ids) == 0:
            return torch.zeros((0, 1))
        return torch.as_tensor(
            np.stack([features_lookup[int(i)] for i in ids]))

    _get_features.current_ids = []
    bt._get_features = _get_features
    return bt


def make_ref_strongsort(features_lookup, **kw):
    install_stubs()
    import strong_sort.strong_sort as m
    orig = m.ReIDDetectMultiBackend
    m.ReIDDetectMultiBackend = _NoReid
    try:
        ss = m.StrongSORT(model_weights=None, device="cpu", fp16=False,
                          **kw)
    finally:
        m.ReIDDetectMultiBackend = orig
    import torch

    def _get_features(xywhs, img):
        ids = _get_features.current_ids
        if len(ids) == 0:
            return torch.zeros((0, 1))
        return torch.as_tensor(
            np.stack([features_lookup[int(i)] for i in ids]))

    _get_features.current_ids = []
    ss._get_features = _get_features
    return ss


def make_ref_deepocsort(features_lookup, warp_fn=None, **kw):
    install_stubs()
    import deep_oc_sort.ocsort as m
    orig = m.ReIDDetectMultiBackend
    m.ReIDDetectMultiBackend = _NoReid
    try:
        oc = m.OCSort(model_weights=None, device="cpu", fp16=False, **kw)
    finally:
        m.ReIDDetectMultiBackend = orig

    import torch

    def _get_features(bbox_xyxy, img):
        ids = _get_features.current_ids
        if len(ids) == 0:
            return torch.zeros((0, 1))
        return torch.as_tensor(
            np.stack([features_lookup[int(i)] for i in ids]))

    _get_features.current_ids = []
    oc._get_features = _get_features
    if warp_fn is None:
        oc.cmc.compute_affine = lambda img, dets, tag: np.eye(2, 3)
    else:
        oc.cmc.compute_affine = lambda img, dets, tag: warp_fn()
    return oc


def make_ref_bpbreid(**kw):
    install_stubs()
    import bpbreid_strong_sort.strong_sort as m
    return m.StrongSORT(**kw)
