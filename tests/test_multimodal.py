from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from signal_messenger_vector_database_spark.operators.multimodal import (
    _pil,
    attach_binary,
    decode_image,
    extract_features,
    fake_features,
    real_features,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


def test_attach_binary_metadata(spark):
    df = spark.createDataFrame([(1, "héllo")], "doc_id long, text string")
    row = attach_binary(df).first()
    assert bytes(row.payload) == "héllo".encode("utf-8")
    assert row.meta.n_bytes == 6  # multibyte é
    assert row.meta.mime == "text/plain"


@pytest.mark.skipif(_pil() is not None, reason="Pillow installed: decode is real")
def test_decode_raises_without_pil():
    # compressed formats still cannot decode without PIL — but the error
    # class is ValueError now that the stub seam is retired (r12): PPM
    # decodes for real, everything else is a clear unsupported-format error
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG")


@pytest.mark.skipif(_pil() is None, reason="Pillow not in this container")
def test_decode_and_real_features_with_pil():
    """The PIL-gated real path: decode a generated 4x4 RGB PNG and assert
    the real featurizer is shape/dtype-interchangeable with the fake one
    behind the same seam (r6 VERDICT task 4)."""
    import io

    Image = _pil()
    im = Image.new("RGB", (4, 4), (200, 10, 10))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    png = buf.getvalue()
    px = decode_image(png)
    assert px.shape == (4, 4, 3) and px.dtype == np.uint8
    real = real_features(png, bins=16)
    fake = fake_features(png, bins=16)
    assert real.shape == fake.shape and real.dtype == fake.dtype
    assert abs(float(real.sum()) - 1.0) < 1e-5


def test_fake_features_shape_and_mass():
    f = fake_features(b"some bytes here", bins=16)
    assert f.shape == (16,)
    assert abs(float(f.sum()) - 1.0) < 1e-5
    assert np.array_equal(f, fake_features(b"some bytes here", bins=16))
    assert fake_features(b"", bins=16).sum() == 0.0


def test_extract_features_df(spark):
    df = attach_binary(
        spark.createDataFrame([(i, f"text {i}") for i in range(5)], "doc_id long, text string")
    )
    # featurizer pinned: these payloads are text bytes, and the auto path
    # would (correctly) try a real image decode wherever Pillow exists
    out = extract_features(df, featurizer=fake_features).collect()
    assert len(out) == 5
    assert all(len(r.features) == 16 for r in out)


def test_sample_frames_explodes_deterministically(spark):
    df = attach_binary(
        spark.createDataFrame([(i, "x" * (10 + i)) for i in range(4)], "doc_id long, text string")
    )
    frames = sample_frames(df).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i in range(4):
        expected_n = ((10 + i) % 3) + 1
        assert len(by_doc[i]) == expected_n
        assert [r.frame_id for r in sorted(by_doc[i], key=lambda r: r.frame_id)] == list(range(expected_n))


def test_stub_resize_arithmetic_and_batch_shape(spark):
    """stub_resize keeps every stride-th byte; the mapInPandas stage must
    reproduce exactly ceil(n/stride) bytes per doc and preserve 1:1 row
    cardinality."""
    from signal_messenger_vector_database_spark.operators.multimodal import (
        attach_binary,
        resize_batch,
        stub_resize,
    )
    from signal_messenger_vector_database_spark.io.sources import load_table

    docs = load_table(spark, SF, "documents").limit(50)
    out = resize_batch(attach_binary(docs)).collect()
    assert len(out) == 50
    strides = set()
    for r in out:
        stride = max(1, r.orig_len // 64)
        strides.add(stride)
        assert len(r.resized) == (r.orig_len + stride - 1) // stride
        assert r.method == "stub"
    # the fixture must exercise stride > 1, or the arithmetic is vacuous
    assert max(strides) > 1
    assert stub_resize(b"abcdefgh", 2, 2) == b"abcdefgh"[::2]


@pytest.mark.skipif(_pil() is None, reason="Pillow not in this container")
def test_real_resize_with_pil():
    """The production arm: a real 4x4 PNG resized to 2x2 decodes back at
    the target dimensions."""
    import io

    import numpy as np
    from PIL import Image

    from signal_messenger_vector_database_spark.operators.multimodal import (
        decode_image,
        resize_image,
    )

    buf = io.BytesIO()
    Image.fromarray(
        (np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    ).save(buf, format="PNG")
    resized = resize_image(buf.getvalue(), 2, 2)
    assert decode_image(resized).shape == (2, 2, 3)


# --- pure-stdlib PPM decode (VERDICT r11 #5: the stub seam retired) --------


def _make_ppm(w, h, fn=lambda j: (31 * j) % 256, header=None):
    raster = bytes(fn(j) for j in range(w * h * 3))
    return (header or f"P6\n{w} {h}\n255\n").encode() + raster


def test_decode_ppm_roundtrip_and_geometry():
    from signal_messenger_vector_database_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
    )

    payload = _make_ppm(5, 4)
    w, h, maxval, px = decode_ppm(payload)
    assert (w, h, maxval) == (5, 4, 255)
    assert px.shape == (4, 5, 3) and px.dtype == np.uint8
    assert px[0, 0, 0] == 0 and px[0, 0, 1] == 31
    # encode_ppm is the exact inverse for canonical headers
    assert encode_ppm(px, maxval) == payload


def test_decode_ppm_handles_header_comments_and_whitespace():
    from signal_messenger_vector_database_spark.operators.multimodal import (
        decode_ppm,
    )

    # the PNM spec allows comments and arbitrary whitespace in the header
    payload = _make_ppm(3, 2, header="P6\n# a comment\n 3\t2 # trailing\n255\n")
    w, h, maxval, px = decode_ppm(payload)
    assert (w, h) == (3, 2) and px.shape == (2, 3, 3)


def test_decode_ppm_rejects_bad_payloads():
    from signal_messenger_vector_database_spark.operators.multimodal import (
        decode_ppm,
    )

    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")  # greyscale PGM: not P6
    with pytest.raises(ValueError):
        decode_ppm(_make_ppm(4, 4)[:-1])  # truncated raster
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)  # 2-byte samples


def test_decode_image_ppm_path_without_pil():
    """decode_image must decode P6 for real regardless of PIL — this is
    the NotImplementedError retirement."""
    payload = _make_ppm(6, 2)
    px = decode_image(payload)
    assert px.shape == (2, 6, 3)


def test_resize_ppm_nearest_neighbor():
    from signal_messenger_vector_database_spark.operators.multimodal import (
        decode_ppm,
        resize_image,
        resize_ppm,
    )

    payload = _make_ppm(8, 8)
    out = resize_ppm(payload, 4, 4)
    w, h, maxval, px = decode_ppm(out)
    assert (w, h) == (4, 4)
    # pixel-center rule: out[0,0] samples src[1,1]
    _, _, _, src = decode_ppm(payload)
    assert np.array_equal(px[0, 0], src[1, 1])
    # identity resize is lossless
    assert resize_ppm(payload, 8, 8) == payload
    if _pil() is None:
        assert resize_image(payload, 4, 4) == out
        with pytest.raises(ValueError):
            resize_image(b"\x89PNG", 2, 2)


def test_decode_ppm_stats_fixtures_match_generator_formula(spark):
    """End-to-end: the catalog query decodes the committed fixtures and
    the per-channel sums must equal the generator's closed form — a
    third, formula-level check independent of BOTH the Python decoder
    and the DuckDB byte-arithmetic oracle."""
    import os
    import re

    from signal_messenger_vector_database_spark.plans.catalog import all_specs

    rows = {
        r.file_name: r
        for r in all_specs()["decode_ppm_stats"].fn(spark, SF).collect()
    }
    assert len(rows) == 6
    for name, r in rows.items():
        f = int(re.match(r"img_(\d+)_", name).group(1))
        w, h = (int(x) for x in re.search(r"_(\d+)x(\d+)\.ppm", name).groups())
        assert (r.width, r.height, r.maxval, r.n_px) == (w, h, 255, w * h)
        for c, col in enumerate(("sum_r", "sum_g", "sum_b")):
            expect = sum(
                (31 * (3 * p + c) + 17 * f) % 256 for p in range(w * h)
            )
            assert getattr(r, col) == expect, (name, col)
