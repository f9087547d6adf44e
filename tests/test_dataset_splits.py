"""Person-disjoint set splitting, SoccerAccuracy, and CLI error paths."""
import numpy as np
import pandas as pd
import pytest


def make_multi_video_set(n_videos=6, n_frames=4):
    """Videos 0&1 share person 100; 2&3 share person 200; 4,5 disjoint."""
    from tracklab_tpu.datastruct.tracking_dataset import TrackingSet
    shared = {0: [100, 1], 1: [100, 2], 2: [200, 3], 3: [200, 4],
              4: [300], 5: [400, 401]}
    image_rows, gt_rows = [], []
    det_id = 0
    img_id = 0
    for v in range(n_videos):
        for f in range(n_frames):
            image_rows.append(dict(id=img_id, video_id=v, frame=f + 1,
                                   file_path=f"/none/{v}/{f}.jpg",
                                   is_labeled=True))
            for p in shared[v]:
                gt_rows.append(dict(
                    id=det_id, image_id=img_id, video_id=v, frame=f + 1,
                    track_id=p, person_id=p,
                    bbox_ltwh=np.array([10, 10, 20, 40], np.float32),
                    bbox_conf=1.0, category_id=1))
                det_id += 1
            img_id += 1
    videos = pd.DataFrame([dict(id=v, name=f"vid{v}", nframes=n_frames)
                           for v in range(n_videos)]).set_index("id")
    images = pd.DataFrame(image_rows).set_index("id")
    gt = pd.DataFrame(gt_rows).set_index("id")
    return TrackingSet(videos, images, gt)


def test_person_disjoint_split(tmp_path):
    from tracklab_tpu.datastruct.tracking_dataset import TrackingDataset
    ts = make_multi_video_set()
    ds = TrackingDataset(str(tmp_path), {"train": ts})
    halves = ds.split_set("train")
    assert len(halves) == 2
    people = []
    vids = []
    for h in halves:
        people.append(set(h.detections_gt.person_id))
        vids.append(set(h.video_metadatas.index))
    # every video assigned exactly once; identities disjoint across halves
    assert vids[0] | vids[1] == set(range(6))
    assert not (vids[0] & vids[1])
    assert not (people[0] & people[1])
    # videos sharing a person stay together
    for pair in ({0, 1}, {2, 3}):
        assert pair <= vids[0] or pair <= vids[1]
    # detections/images restricted consistently
    for h in halves:
        assert set(h.image_metadatas.video_id) == set(h.video_metadatas.index)
        assert set(h.detections_gt.video_id) == set(h.video_metadatas.index)


def test_set_split_idxs_ctor(tmp_path):
    from tracklab_tpu.datastruct.tracking_dataset import TrackingDataset
    ts = make_multi_video_set()
    ds = TrackingDataset(str(tmp_path), {"train": ts},
                         set_split_idxs={"train": 1})
    assert "train" in ds.set_splits
    kept = set(ds.sets["train"].video_metadatas.index)
    assert kept == set(ds.set_splits["train"][1].video_metadatas.index)
    assert 0 < len(kept) < 6


def test_soccer_accuracy():
    from tracklab_tpu.eval import SoccerAccuracy

    class State:
        pass

    gt_rows, pred_rows = [], []
    for img in range(3):
        for k in range(2):
            box = np.array([50 * k, 10, 30, 60], np.float32)
            gt_rows.append(dict(image_id=img, bbox_ltwh=box,
                                role="player", team="left" if k == 0
                                else "right", jersey_number=k + 7))
            pred_rows.append(dict(
                image_id=img, bbox_ltwh=box + 1.0, role="player",
                # one team wrong on every frame, jersey right
                team="left", jersey_number=k + 7))
    st = State()
    st.detections_gt = pd.DataFrame(gt_rows)
    st.detections_pred = pd.DataFrame(pred_rows)
    res = SoccerAccuracy().run(st)
    assert res["matched_detections"] == 6
    assert res["role_accuracy"] == 100.0
    assert res["team_accuracy"] == pytest.approx(50.0)
    assert res["jersey_number_accuracy"] == 100.0


def test_cli_exit_codes():
    from tracklab_tpu.main import cli
    assert cli(["dataset=doesnotexist"]) == 1


def test_unknown_group_option_lists_choices():
    from tracklab_tpu.config import compose
    from tracklab_tpu.main import CONFIG_DIR
    with pytest.raises(FileNotFoundError, match="mot17"):
        compose(CONFIG_DIR, "config", ["dataset=doesnotexist"])
