"""GS-HOTA cross-validation against the independent oracle (VERDICT r3
item 5): randomized game-state streams must agree to 1e-10 across all
attribute-gating configurations, plus golden hand-built sequences with
values derivable by hand — the same treatment HOTA/CLEAR/Identity got
against the vendored forks (tests/test_reference_metric_parity.py).

Reference semantics: sn-trackeval's SoccerNetGS dataset (reference
pyproject.toml:30, eval/trackeval_evaluator.py:70-98) — similarity =
gaussian pitch distance (tol meters) gated by role/team/jersey identity.
"""
from __future__ import annotations

import numpy as np
import pytest

from tests.oracles.gs_hota_oracle import ALPHAS, gs_hota_oracle
from tracklab_tpu.eval.gs_metrics import make_gs_sequence_data
from tracklab_tpu.eval.metrics import hota_metrics

ROLES = ["player", "goalkeeper", "referee", None]
TEAMS = ["left", "right", None]
JERSEYS = [1, 4, 7, 10, 23, None]


def random_stream(rng, n_frames=25, n_obj=8, drop=0.25, id_switch=0.1,
                  attr_noise=0.3, pos_noise=3.0):
    """A GT stream and a degraded prediction stream over the pitch."""
    base_pos = rng.uniform([-50, -30], [50, 30], (n_obj, 2))
    vel = rng.uniform(-1.5, 1.5, (n_obj, 2))
    attrs = [{"role": ROLES[rng.integers(len(ROLES))],
              "team": TEAMS[rng.integers(len(TEAMS))],
              "jersey": JERSEYS[rng.integers(len(JERSEYS))]}
             for _ in range(n_obj)]
    gt, pred = {}, {}
    pred_id = np.arange(n_obj)
    for f in range(n_frames):
        base_pos = base_pos + vel
        g_keep = rng.uniform(size=n_obj) > drop * 0.5
        p_keep = rng.uniform(size=n_obj) > drop
        sw = rng.uniform(size=n_obj) < id_switch
        pred_id = np.where(sw, pred_id + n_obj, pred_id)
        gids = np.nonzero(g_keep)[0]
        gt[f] = (gids.copy(), base_pos[gids].copy(),
                 [dict(attrs[i]) for i in gids])
        pids = np.nonzero(p_keep)[0]
        pattrs = []
        for i in pids:
            a = dict(attrs[i])
            if rng.uniform() < attr_noise:
                k = ["role", "team", "jersey"][rng.integers(3)]
                pool = {"role": ROLES, "team": TEAMS,
                        "jersey": JERSEYS}[k]
                a[k] = pool[rng.integers(len(pool))]
            pattrs.append(a)
        ppos = base_pos[pids] + rng.normal(0, pos_noise, (len(pids), 2))
        pred[f] = (pred_id[pids].copy(), ppos, pattrs)
    return gt, pred


KEYS = ["HOTA_TP", "HOTA_FN", "HOTA_FP", "AssA_num", "LocA_sum",
        "FragA_num", "HOTA_alpha", "DetA_alpha", "AssA_alpha"]
SCALARS = ["HOTA", "DetA", "AssA", "LocA", "FragA"]


def assert_agree(gt, pred, dist_tol=5.0, use_roles=True, use_teams=True,
                 use_jerseys=True):
    ours = hota_metrics(make_gs_sequence_data(
        gt, pred, dist_tol, use_roles, use_teams, use_jerseys))
    ref = gs_hota_oracle(gt, pred, dist_tol, use_roles, use_teams,
                         use_jerseys)
    for k in KEYS:
        np.testing.assert_allclose(ours[k], ref[k], atol=1e-10,
                                   err_msg=k)
    for k in SCALARS:
        assert abs(ours[k] - ref[k]) < 1e-9, (k, ours[k], ref[k])
    return ours


@pytest.mark.parametrize("seed", range(6))
def test_random_streams_match_oracle(seed):
    rng = np.random.default_rng(seed)
    gt, pred = random_stream(rng)
    assert_agree(gt, pred)


@pytest.mark.parametrize("use_roles,use_teams,use_jerseys", [
    (False, False, False), (True, False, False), (False, True, False),
    (False, False, True), (True, True, False), (True, True, True),
])
def test_gating_configs_match_oracle(use_roles, use_teams, use_jerseys):
    rng = np.random.default_rng(99)
    gt, pred = random_stream(rng, attr_noise=0.5)
    assert_agree(gt, pred, use_roles=use_roles, use_teams=use_teams,
                 use_jerseys=use_jerseys)


def test_degenerate_streams_match_oracle():
    rng = np.random.default_rng(7)
    gt, pred = random_stream(rng, n_frames=10, n_obj=4)
    empty = {f: (np.zeros(0, int), np.zeros((0, 2)), [])
             for f in range(10)}
    # empty predictions / empty GT / frames present on one side only
    assert_agree(gt, empty)
    assert_agree(empty, pred)
    gt2 = {f: v for f, v in gt.items() if f % 2 == 0}
    assert_agree(gt2, pred)


# ---------------------------------------------------------------------------
# Golden hand-built sequences
# ---------------------------------------------------------------------------

def one_frame(ids, pos, attrs):
    return {0: (np.asarray(ids, int), np.asarray(pos, float), attrs)}


PLAYER_L7 = {"role": "player", "team": "left", "jersey": 7}
PLAYER_R7 = {"role": "player", "team": "right", "jersey": 7}
PLAYER_L9 = {"role": "player", "team": "left", "jersey": 9}
REF_NONE = {"role": "referee", "team": None, "jersey": None}


def test_golden_perfect_is_100():
    gt = {f: (np.array([0, 1]), np.array([[0.0, 0], [10, 5]]),
              [dict(PLAYER_L7), dict(REF_NONE)]) for f in range(5)}
    res = assert_agree(gt, gt)
    assert res["HOTA"] == pytest.approx(100.0)
    assert res["DetA"] == pytest.approx(100.0)
    assert res["AssA"] == pytest.approx(100.0)


def test_golden_team_mismatch_is_fp_plus_fn():
    """One detection, right position, wrong team: similarity 0 =>
    the pred is a FP and the GT a FN at every alpha => HOTA 0."""
    gt = one_frame([0], [[0.0, 0.0]], [dict(PLAYER_L7)])
    pred = one_frame([0], [[0.0, 0.0]], [dict(PLAYER_R7)])
    res = assert_agree(gt, pred)
    assert res["HOTA"] == pytest.approx(0.0)
    np.testing.assert_allclose(res["HOTA_FP"], 1.0)
    np.testing.assert_allclose(res["HOTA_FN"], 1.0)
    # gate off teams: exact position, same role+jersey => perfect
    res2 = assert_agree(gt, pred, use_teams=False)
    assert res2["HOTA"] == pytest.approx(100.0)


def test_golden_jersey_none_semantics():
    """None == None matches; None vs value does not."""
    gt = one_frame([0], [[0.0, 0.0]], [dict(REF_NONE)])
    pred_none = one_frame([0], [[0.0, 0.0]], [dict(REF_NONE)])
    assert assert_agree(gt, pred_none)["HOTA"] == pytest.approx(100.0)
    pred_val = one_frame(
        [0], [[0.0, 0.0]],
        [{"role": "referee", "team": None, "jersey": 4}])
    assert assert_agree(gt, pred_val)["HOTA"] == pytest.approx(0.0)


def test_golden_distance_threshold_alphas():
    """d = tol*sqrt(2*ln 2) gives sim = 0.5 exactly: TP for alphas
    <= 0.5, FP+FN above => DetA_alpha steps at 0.5."""
    tol = 5.0
    d = tol * np.sqrt(2.0 * np.log(2.0))
    gt = one_frame([0], [[0.0, 0.0]], [dict(PLAYER_L7)])
    pred = one_frame([0], [[d, 0.0]], [dict(PLAYER_L7)])
    res = assert_agree(gt, pred, dist_tol=tol)
    exp_det = (ALPHAS <= 0.5 + 1e-12).astype(float) / np.where(
        ALPHAS <= 0.5 + 1e-12, 1.0, 2.0)
    np.testing.assert_allclose(res["DetA_alpha"], exp_det, atol=1e-12)


def test_golden_id_switch_halves_assa():
    """10 frames, one GT object, pred id switches at frame 5: DetA
    stays 1, AssA = 0.5 at every alpha (two 5/10 associations)."""
    gt = {f: (np.array([0]), np.array([[1.0 * f, 0.0]]),
              [dict(PLAYER_L9)]) for f in range(10)}
    pred = {f: (np.array([0 if f < 5 else 1]),
                np.array([[1.0 * f, 0.0]]), [dict(PLAYER_L9)])
            for f in range(10)}
    res = assert_agree(gt, pred)
    np.testing.assert_allclose(res["DetA_alpha"], 1.0)
    # each pred id: m=5, union = 10 + 5 - 5 = 10 -> ass = 0.5
    np.testing.assert_allclose(res["AssA_alpha"], 0.5)
    assert res["HOTA"] == pytest.approx(np.sqrt(0.5) * 100)


def test_golden_two_object_attribute_disambiguation():
    """Two GT at the same spot distinguished only by jersey: the gate
    forces the cross pairing even though positions tie."""
    gt = one_frame([0, 1], [[0.0, 0.0], [0.0, 0.0]],
                   [dict(PLAYER_L7), dict(PLAYER_L9)])
    pred = one_frame([10, 11], [[0.0, 0.0], [0.0, 0.0]],
                     [dict(PLAYER_L9), dict(PLAYER_L7)])
    res = assert_agree(gt, pred)
    assert res["DetA"] == pytest.approx(100.0)
    # without jerseys the positions tie exactly — still both matched
    res2 = assert_agree(gt, pred, use_jerseys=False)
    assert res2["DetA"] == pytest.approx(100.0)
