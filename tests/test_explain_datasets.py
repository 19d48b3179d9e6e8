"""VOC/COCO benchmark adapter tests on fabricated annotations."""

import json
import os

import numpy as np

from scouter_tpu.explain.datasets import (
    VOC_CLASSES,
    coco_annotation_to_mask,
    coco_dataset,
    voc_annotation_to_mask,
    voc_dataset,
)

VOC_XML = """<annotation>
  <size><width>40</width><height>30</height><depth>3</depth></size>
  <object><name>cat</name><difficult>0</difficult>
    <bndbox><xmin>5</xmin><ymin>6</ymin><xmax>15</xmax><ymax>16</ymax></bndbox>
  </object>
  <object><name>dog</name><difficult>1</difficult>
    <bndbox><xmin>20</xmin><ymin>20</ymin><xmax>30</xmax><ymax>28</ymax></bndbox>
  </object>
</annotation>"""


def test_voc_mask(tmp_path):
    p = tmp_path / "a.xml"
    p.write_text(VOC_XML)
    mask = voc_annotation_to_mask(str(p), "cat")
    assert mask.shape == (30, 40)
    assert mask[10, 10] == 1 and mask[0, 0] == 0
    # difficult boxes are INCLUDED by default — torchray's voc_as_mask
    # (datasets.py:98-125) builds the mask with no difficult filter; the
    # difficult subset is handled by the benchmark's flag list, not the mask
    assert voc_annotation_to_mask(str(p), "dog")[24, 24] == 1
    assert voc_annotation_to_mask(str(p), "dog", include_difficult=False) is None
    assert voc_annotation_to_mask(str(p), "person") is None


def test_voc_dataset_iteration(tmp_path):
    root = tmp_path / "voc"
    (root / "Annotations").mkdir(parents=True)
    (root / "JPEGImages").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    (root / "Annotations" / "img1.xml").write_text(VOC_XML)
    (root / "ImageSets" / "Main" / "test.txt").write_text("img1\n")
    items = list(voc_dataset(str(root)))
    # reference protocol: class presence ignores the difficult flag
    # (voc_as_class_ids, datasets.py:81-95) -> both cat and dog pairs
    assert len(items) == 2
    by_class = {VOC_CLASSES[cid]: (path, mask) for path, cid, mask in items}
    assert set(by_class) == {"cat", "dog"}
    assert by_class["cat"][0].endswith("img1.jpg")
    assert by_class["cat"][1].sum() > 0 and by_class["dog"][1][24, 24] == 1


def test_coco_polygon_and_bbox(tmp_path):
    anns = [
        {"category_id": 1, "segmentation": [[2, 2, 12, 2, 12, 12, 2, 12]]},
        {"category_id": 2, "bbox": [15, 15, 5, 5]},
    ]
    m1 = coco_annotation_to_mask(anns, 1, 24, 24)
    assert m1[6, 6] == 1 and m1[20, 20] == 0
    m2 = coco_annotation_to_mask(anns, 2, 24, 24)
    assert m2[17, 17] == 1 and m2[5, 5] == 0
    assert coco_annotation_to_mask(anns, 3, 24, 24) is None

    coco = {
        "images": [{"id": 7, "file_name": "x.jpg", "height": 24, "width": 24}],
        "annotations": [dict(a, image_id=7, id=i) for i, a in enumerate(anns)],
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
    }
    p = tmp_path / "instances.json"
    p.write_text(json.dumps(coco))
    items = list(coco_dataset(str(tmp_path), str(p)))
    assert len(items) == 2
    assert {c for _, c, _ in items} == {1, 2}
