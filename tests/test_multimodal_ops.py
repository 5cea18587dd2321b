"""Multimodal plumbing beyond decode: resize (payload replacement) and
frame sampling (1->N fan-out) — the mapInPandas shapes a real decoder
uses; only the codec is a deterministic fake (no pixel/video libs in this
container)."""

from __future__ import annotations

from pyspark.sql import Row

from epiteam_network_etl_functions_spark.operators.multimodal import (
    attach_binary_payload,
    resize_images,
    sample_frames,
)


def _payloads(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a" * 100),
            Row(doc_id=2, text="b" * 1000),
            Row(doc_id=3, text="short"),
        ]
    )
    return attach_binary_payload(docs, "doc_id", "text")


def test_resize_replaces_payload_with_target_dims(spark):
    out = resize_images(_payloads(spark), 32, 16).collect()
    assert len(out) == 3  # 1 row in -> 1 row out
    for r in out:
        assert r["width"] == 32 and r["height"] == 16
        assert len(r["payload"]) == 3 * 32 * 16
        assert r["resizer"] == "fake-md5"
    # deterministic: same input -> same bytes
    again = {r["doc_id"]: bytes(r["payload"]) for r in resize_images(_payloads(spark), 32, 16).collect()}
    for r in out:
        assert bytes(r["payload"]) == again[r["doc_id"]]
    # different inputs -> different payloads (content-derived, not constant)
    assert len({bytes(r["payload"]) for r in out}) == 3


def test_resize_payload_cap_bounds_batch_memory(spark):
    out = resize_images(_payloads(spark), 4096, 4096).collect()
    for r in out:
        assert len(r["payload"]) == 1 << 20  # capped at 1 MiB


def test_sample_frames_fan_out_and_ordering(spark):
    out = sample_frames(_payloads(spark), every_n=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 2: 1000 bytes -> 16 chunks of 64 -> kept 0,3,6,9,12,15
    d2 = sorted(by_doc[2], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in d2] == [0, 3, 6, 9, 12, 15]
    assert all(r["n_frames"] == 16 for r in d2)
    assert len(d2[0]["frame"]) == 64
    assert len(d2[-1]["frame"]) == 1000 - 15 * 64  # tail frame is short
    # doc 3: 5 bytes -> 1 chunk -> 1 kept frame
    assert [r["frame_idx"] for r in by_doc[3]] == [0]
    # frames re-concatenate to the sampled slices of the original payload
    orig = b"b" * 1000
    for r in d2:
        start = r["frame_idx"] * 64
        assert bytes(r["frame"]) == orig[start : start + 64]
