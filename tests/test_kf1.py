"""KF1/MEVA Kitware annotation ingest (reference diva_io/annotation/kf1.py,
converter.py) against a synthetic YAML fixture."""

import json
import os

import pytest

yaml = pytest.importorskip("yaml")

from object_detection_tracking_tpu.data.kf1 import (KF1Annotation,
                                                    convert_kf1)

CLIP = "2018-03-07.16-50-00.17-00-00.school.G336"


def _write_fixture(root):
    # clip starts at 16:xx but annotations live under the END hour dir
    # (17): exercises the hour-fallback search path
    d = os.path.join(root, "2018-03-07", "17")
    os.makedirs(d)

    geom = [{"meta": "geom metadata"}]
    for fid in (10, 11, 12, 14):  # frame 13 missing on purpose
        geom.append({"geom": {"id1": 5, "ts0": fid,
                              "g0": f"{100+fid} 50 {160+fid} 170"}})
    geom.append({"geom": {"id1": 9, "ts0": 11, "g0": "300 200 420 260"}})
    with open(os.path.join(d, f"{CLIP}.geom.yml"), "w") as f:
        yaml.safe_dump(geom, f)

    types = [{"meta": "types metadata"},
             {"types": {"id1": 5, "cset3": {"person": 1.0}}},
             {"types": {"id1": 9, "cset3": {"vehicle": 1.0}}}]
    with open(os.path.join(d, f"{CLIP}.types.yml"), "w") as f:
        yaml.safe_dump(types, f)

    acts = [
        {"meta": "activities metadata"},
        {"act": {"act2": {"person_opens_vehicle_door": 1.0}, "id2": 3,
                 "timespan": [{"tsr0": [10, 14]}],
                 "actors": [
                     {"id1": 5, "timespan": [{"tsr0": [10, 12]},
                                             {"tsr0": [14, 14]}]},
                     {"id1": 9, "timespan": [{"tsr0": [11, 11]}]}]}},
        {"act": {"act2": {"empty_placeholder": 1.0}, "id2": 4,
                 "timespan": [{"tsr0": [0, 5]}], "actors": []}},
    ]
    with open(os.path.join(d, f"{CLIP}.activities.yml"), "w") as f:
        yaml.safe_dump(acts, f)


def test_kf1_parse_and_official_format(tmp_path):
    _write_fixture(str(tmp_path))
    ann = KF1Annotation(CLIP, str(tmp_path))

    assert ann.actors[5].kind == "person"
    assert ann.actors[9].kind == "vehicle"
    assert ann.actors[5].boxes[10] == (110, 50, 170, 170)

    acts = ann.get_activities_official()
    assert len(acts) == 1  # empty_* filtered out (reference kf1.py:71-72)
    act = acts[0]
    assert act["activity"] == "person_opens_vehicle_door"
    assert act["activityID"] == 3
    assert act["alertFrame"] == 10
    # activity localization: 1 at start, 0 at end+1
    assert act["localization"][CLIP] == {10: 1, 15: 0}

    objs = {o["objectID"]: o for o in act["objects"]}
    assert set(objs) == {5, 9}
    hist5 = objs[5]["localization"][CLIP]
    # frames with geometry inside the actor spans carry boxes
    assert hist5[10]["boundingBox"] == {"x": 110, "y": 50, "w": 60, "h": 120}
    assert hist5[14]["boundingBox"]["x"] == 114
    # frame 13: inside the activity span but no geometry -> empty marker
    assert hist5[13] == {}
    # the official format hardcodes Vehicle (reference kf1.py:88)
    assert objs[5]["objectType"] == "Vehicle"
    hist9 = objs[9]["localization"][CLIP]
    assert hist9[11]["boundingBox"] == {"x": 300, "y": 200, "w": 120, "h": 60}


def test_kf1_converter_cli(tmp_path):
    _write_fixture(str(tmp_path))
    lst = tmp_path / "clips.lst"
    lst.write_text(CLIP + "\n")
    out = tmp_path / "out"

    from object_detection_tracking_tpu.cli.kf1_convert import main
    main([str(tmp_path), str(out), "--video_lst", str(lst)])

    ref = json.load(open(out / "reference.json"))
    idx = json.load(open(out / "file-index.json"))
    assert ref["filesProcessed"] == [CLIP]
    assert len(ref["activities"]) == 1
    assert idx[CLIP]["framerate"] == 30.0
    assert idx[CLIP]["selected"] == {"0": 1, "9000": 0}
