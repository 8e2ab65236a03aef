"""Label codec and annotation-cleanup tests."""
import numpy as np
import pandas as pd

from bsed_tpu.config import BIRD_LIST
from bsed_tpu.data.annotations import (clean_annotations, drop_short_events,
                                       merge_close_events, seeded_split,
                                       segment_annotations, split_at_boundary,
                                       union_same_label_overlaps)
from bsed_tpu.data.codec import ManyHotEncoder, find_contiguous_regions


def make_encoder(n_frames=313):
    return ManyHotEncoder(BIRD_LIST, n_frames=n_frames)


def test_encode_weak_comma_split_and_empty_sentinel():
    enc = make_encoder()
    y = enc.encode_weak(["EATO,WOTH", "BAWW"])
    assert y[BIRD_LIST.index("EATO")] == 1
    assert y[BIRD_LIST.index("WOTH")] == 1
    assert y[BIRD_LIST.index("BAWW")] == 1
    assert y.sum() == 3
    assert (enc.encode_weak("empty") == -1).all()
    assert enc.decode_weak(y) == ["EATO", "WOTH", "BAWW"]


def test_encode_strong_floor_division_semantics():
    enc = make_encoder()
    # reference: int(t * sr // hop // ptr) with sr=32000, hop=255, ptr=4
    y = enc.encode_strong([("EATO", 1.0, 2.0)])
    a = int(1.0 * 32000 // 255 // 4)   # 31
    b = int(2.0 * 32000 // 255 // 4)   # 62
    assert a == 31 and b == 62
    col = y[:, BIRD_LIST.index("EATO")]
    assert col[a:b].all() and col.sum() == b - a


def test_strong_roundtrip_decode():
    enc = make_encoder(n_frames=100)
    y = np.zeros((100, len(BIRD_LIST)))
    y[10:20, 3] = 1
    y[50:51, 3] = 1
    y[0:5, 7] = 1
    events = enc.decode_strong(y)
    assert [BIRD_LIST[3], 10, 20] in events
    assert [BIRD_LIST[3], 50, 51] in events
    assert [BIRD_LIST[7], 0, 5] in events
    assert len(events) == 3


def test_find_contiguous_regions_edges():
    assert find_contiguous_regions(np.array([1, 1, 0, 1])).tolist() == [[0, 2], [3, 4]]
    assert find_contiguous_regions(np.array([0, 0])).tolist() == []
    assert find_contiguous_regions(np.array([1])).tolist() == [[0, 1]]


def test_merge_close_events_chains_and_respects_labels():
    ev = [("EATO", 0.0, 1.0), ("EATO", 1.1, 2.0), ("EATO", 2.05, 3.0),
          ("WOTH", 1.05, 1.5), ("EATO", 5.0, 6.0)]
    merged = merge_close_events(ev, gap=0.15)
    assert ("EATO", 0.0, 3.0) in merged
    assert ("EATO", 5.0, 6.0) in merged
    assert ("WOTH", 1.05, 1.5) in merged
    assert len(merged) == 3


def test_drop_short_is_strict():
    ev = [("EATO", 0.0, 0.2), ("EATO", 0.0, 0.201)]
    kept = drop_short_events(ev, min_dur=0.2)
    assert kept == [("EATO", 0.0, 0.201)]


def test_split_at_boundary():
    ev = [("EATO", 9.0, 11.0), ("WOTH", 2.0, 3.0)]
    out = split_at_boundary(ev, 10.0)
    assert ("WOTH", 2.0, 3.0) in out
    assert ("EATO", 9.0, 10.0 - 1e-6) in out
    assert ("EATO", 10.0, 11.0) in out


def test_union_same_label_overlaps_transitive():
    ev = [("EATO", 0.0, 2.0), ("EATO", 1.5, 4.0), ("EATO", 4.0, 5.0),
          ("EATO", 7.0, 8.0), ("WOTH", 1.0, 3.0)]
    out = union_same_label_overlaps(ev)
    assert ("EATO", 0.0, 5.0) in out       # touching intervals union (<=)
    assert ("EATO", 7.0, 8.0) in out
    assert ("WOTH", 1.0, 3.0) in out
    assert len(out) == 3


def test_segment_annotations_relative_times():
    ev = [("EATO", 9.5, 10.5), ("WOTH", 15.0, 16.0)]
    segs = segment_annotations(ev, n_segments=2)
    assert any(np.isclose(a, 9.5) and np.isclose(b, 10.0 - 1e-6)
               for (l, a, b) in segs[0] if l == "EATO")
    labels1 = {l for (l, a, b) in segs[1]}
    assert labels1 == {"EATO", "WOTH"}
    # segment-relative
    woth = [e for e in segs[1] if e[0] == "WOTH"][0]
    assert np.isclose(woth[1], 5.0) and np.isclose(woth[2], 6.0)


def test_clean_annotations_pipeline():
    df = pd.DataFrame({
        "event_label": ["EATO", "EATO", "WOTH"],
        "onset": [0.0, 1.05, 0.0],
        "offset": [1.0, 2.0, 0.1],
    })
    ev = clean_annotations(df)
    assert ("EATO", 0.0, 2.0) in ev      # merged across the 0.05 s gap
    assert all(l != "WOTH" for l, *_ in ev)  # 0.1 s event dropped


def test_seeded_split_is_deterministic_and_proportioned():
    files = [f"clip_{i}" for i in range(64)]
    w1, u1, v1 = seeded_split(files, seed=1215)
    w2, u2, v2 = seeded_split(list(reversed(files)), seed=1215)
    assert (w1, u1, v1) == (w2, u2, v2)
    assert len(v1) == 32 and len(w1) == 8 and len(u1) == 24
    assert set(w1) | set(u1) | set(v1) == set(files)


def test_segment_annotations_drops_exact_boundary_offset_like_reference():
    """Reference-pinned edge case: an event whose offset lands EXACTLY on a
    segment boundary is dropped entirely — ``overlap`` only splits strict
    straddlers (onset < t < offset, preprocess.py:51), and the segment
    filter requires offset < t1 (preprocess.py:215), so (3.0, 10.0) passes
    neither segment [0,10) nor [10,20). Events split by the boundary get
    offset = t − 1e-6 and survive. This repo intentionally reproduces the
    reference's behavior; do not 'fix' it without breaking parity."""
    segs = segment_annotations([("A", 3.0, 10.0)], n_segments=2)
    assert segs[0] == [] and segs[1] == []
    # a strict straddler IS split and lands in both segments
    segs = segment_annotations([("A", 3.0, 12.0)], n_segments=2)
    assert len(segs[0]) == 1 and len(segs[1]) == 1
    assert abs(segs[0][0][2] - (10.0 - 1e-6)) < 1e-9
    assert segs[1][0][1:] == (0.0, 2.0)
