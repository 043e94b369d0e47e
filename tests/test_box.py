"""Golden tests for box serialization/parsing (reference base_dataset.py:142-176,
eval_box.py:55-130)."""

import numpy as np

from merlin_tpu.data.box import (
    box_iou_xyxy,
    de_norm_box_xyxy,
    extract_boxes,
    serialize_box,
    serialize_boxes,
    shuffle_and_sample_boxes,
)


def test_serialize_box_format():
    assert serialize_box([0.1, 0.2, 0.3, 0.4]) == "[100, 200, 300, 400]"
    assert serialize_box([0.0, 0.0, 1.0, 1.0]) == "[000, 000, 1000, 1000]"


def test_serialize_boxes_resize_xywh():
    # xywh (10,20,30,40) on a 100x200 image, resize aspect:
    # xyxy = (10,20,40,60); normalized = (0.1, 0.1, 0.4, 0.3)
    out = serialize_boxes(
        [np.array([[10.0, 20.0, 30.0, 40.0]])],
        [(100, 200)],
        image_aspect_ratio="resize",
    )
    assert out == ["[100, 100, 400, 300]"]


def test_serialize_boxes_pad():
    # pad aspect normalizes by max edge (200): xyxy=(10,20,40,60)/200
    out = serialize_boxes(
        [np.array([[10.0, 20.0, 30.0, 40.0]])],
        [(100, 200)],
        image_aspect_ratio="pad",
    )
    assert out == ["[050, 100, 200, 300]"]


def test_serialize_boxes_openimages_normalized_xyxy():
    # OpenImages path: input is normalized xyxy, gets denormed then renormed
    out = serialize_boxes(
        [np.array([[0.1, 0.2, 0.5, 0.6]])],
        [(640, 480)],
        image_path="OpenImages/foo.jpg",
        image_aspect_ratio="resize",
    )
    assert out == ["[100, 200, 500, 600]"]


def test_serialize_boxes_clamped():
    out = serialize_boxes(
        [np.array([[90.0, 90.0, 50.0, 50.0]])],  # xywh overflowing the image
        [(100, 100)],
        image_aspect_ratio="resize",
    )
    assert out == ["[900, 900, 1000, 1000]"]


def test_extract_boxes_roundtrip():
    text = "the object is at [100, 200, 300, 400] moving to [110,210,310,410]"
    groups = extract_boxes(text)
    assert groups == [[[100, 200, 300, 400]], [[110, 210, 310, 410]]]


def test_extract_boxes_multibox_group():
    groups = extract_boxes("[1,2,3,4;5,6,7,8]")
    assert groups == [[[1, 2, 3, 4], [5, 6, 7, 8]]]


def test_extract_boxes_none():
    assert extract_boxes("no boxes here [1, 2] nope") == []


def test_de_norm_clamps():
    assert de_norm_box_xyxy((0.5, 0.5, 1.5, 1.5), w=100, h=200) == (50, 100, 100, 200)


def test_shuffle_and_sample_limit():
    boxes = list(range(10))
    out = shuffle_and_sample_boxes(boxes, box_limit=3)
    assert len(out) == 3 and set(out) <= set(boxes)
    assert shuffle_and_sample_boxes(boxes, box_limit=20) == boxes
    assert shuffle_and_sample_boxes(boxes, box_limit=0) == boxes


def test_iou():
    assert box_iou_xyxy((0, 0, 2, 2), (1, 1, 3, 3)) == 1 / 7
    assert box_iou_xyxy((0, 0, 1, 1), (2, 2, 3, 3)) == 0.0
