"""Multimodal binary-column pipeline tests: container roundtrip, Arrow
batch shape, frame sampling, resize semantics, real-codec gate."""

import hashlib

import pytest
from pyspark.sql import functions as F

from dsci551_edfs_spark.pipeline import multimodal as MM
from dsci551_edfs_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return MM.attach_media(load_table(spark, sf_dir, "documents")).cache()


def test_container_layout(media):
    row = media.filter("doc_id = 2").first()
    b = bytes(row["media"])
    assert b.startswith(b"FAKE|vid|")
    assert b[: MM.HEADER_LEN].endswith(b"|")
    meta = row["media_meta"]
    assert (meta["kind"], meta["width"], meta["height"], meta["n_frames"]) == (
        "vid", 18, 18, 4,
    )


def test_decode_roundtrip(media, spark, sf_dir):
    """decode(attach(df)) must reproduce the metadata struct and the payload
    md5 of the source text, across multiple partitions."""
    decoded = MM.decode_media(media.repartition(5)).collect()
    docs = {r["doc_id"]: r["text"] for r in
            load_table(spark, sf_dir, "documents").collect()}
    assert len(decoded) == len(docs)
    for r in decoded:
        raw = docs[r["doc_id"]].encode()
        assert r["payload_bytes"] == len(raw)
        assert r["payload_md5"] == hashlib.md5(raw).hexdigest()
        assert r["kind"] == ("img", "aud", "vid")[r["doc_id"] % 3]


def test_decode_empty_partition(media):
    """mapInPandas must tolerate partitions that receive no batches."""
    out = MM.decode_media(media.repartition(64))
    assert out.count() == media.count()


def test_frame_sample(media):
    frames = MM.frame_sample(media, every=2)
    rows = frames.filter("doc_id = 2").collect()  # doc 2: vid, 4 frames
    assert sorted(r["frame_idx"] for r in rows) == [0, 2]
    # frame slices must be distinct content with equal length
    assert len({r["frame_sig"] for r in rows}) == 2
    assert len({r["frame_bytes"] for r in rows}) == 1
    # only videos produce frames
    kinds = frames.join(media, "doc_id").select("media_meta.kind").distinct().collect()
    assert [k["kind"] for k in kinds] == ["vid"]


def test_resize_crops_and_rewrites_header(media):
    resized = MM.decode_media(MM.resize_media(media, 8, 8))
    for r in resized.collect():
        assert (r["width"], r["height"]) == (8, 8)
        assert r["payload_bytes"] <= 64
    # kind and frame metadata survive the resize
    kinds = set(r["kind"] for r in resized.collect())
    assert kinds == {"img", "aud", "vid"}


def test_real_codec_path_is_gated(media):
    with pytest.raises(NotImplementedError):
        MM.resize_media(media, 8, 8, use_real=True)


def test_injected_codec(media, spark, sf_dir):
    """A user-supplied codec drops into decode_media without engine changes:
    base columns unchanged, codec columns appended with the declared types."""
    from pyspark.sql import types as T

    def _toy_codec(kind, payload):
        # stand-in for a real decoder: derives typed features from the bytes
        # (what PIL/torchaudio would compute from pixels/samples); defined
        # in-function so cloudpickle ships it by value to executors
        return {
            "first_byte": int(payload[0]) if payload else -1,
            "codec_tag": f"toy-{kind}",
        }

    out = MM.decode_media(
        media.repartition(5),
        codec=_toy_codec,
        codec_fields=[
            T.StructField("first_byte", T.IntegerType()),
            T.StructField("codec_tag", T.StringType()),
        ],
    )
    docs = {r["doc_id"]: r["text"] for r in
            load_table(spark, sf_dir, "documents").collect()}
    rows = out.collect()
    assert len(rows) == len(docs)
    for r in rows:
        raw = docs[r["doc_id"]].encode()
        assert r["payload_md5"] == hashlib.md5(raw).hexdigest()  # base intact
        assert r["first_byte"] == (raw[0] if raw else -1)
        assert r["codec_tag"] == f"toy-{r['kind']}"
    # codec and codec_fields must travel together
    with pytest.raises(ValueError):
        MM.decode_media(media, codec=_toy_codec)


def test_byte_histogram(media):
    hist = MM.media_byte_histogram(media, buckets=16)
    row = hist.filter("doc_id = 0").first()
    assert len(row["hist"]) == 16
    payload = bytes(media.filter("doc_id = 0").first()["media"])[MM.HEADER_LEN:]
    assert sum(row["hist"]) == len(payload)
    assert row["mean_byte"] == pytest.approx(sum(payload) / len(payload))


def test_chunk_audio(media):
    from pyspark.sql import functions as F

    chunks = MM.chunk_audio(media, chunk_ms=250)
    # only audio rows chunk
    kinds = chunks.join(media, "doc_id").select("media_meta.kind").distinct().collect()
    assert [k["kind"] for k in kinds] == ["aud"]
    # chunks tile the payload exactly: sum(chunk_bytes) == payload size
    sizes = {
        r["doc_id"]: r["total"]
        for r in chunks.groupBy("doc_id")
        .agg(F.sum("chunk_bytes").alias("total"))
        .collect()
    }
    payloads = {
        r["doc_id"]: len(bytes(r["media"])) - MM.HEADER_LEN
        for r in media.filter("media_meta.kind = 'aud'").collect()
    }
    assert sizes == payloads
    # chunk signatures are distinct within a doc (content varies)
    one = chunks.filter("doc_id = 1").collect()
    assert len({r["chunk_sig"] for r in one}) == len(one)


@pytest.mark.skipif(
    not MM.HAS_IMAGE_CODEC, reason="Pillow not installed in this container"
)
def test_real_image_codec_through_hook(spark):
    """When a REAL image codec is present, it must drop into the exact
    codec= call site the deterministic fake occupies: container payloads
    are genuine PNGs, the injected codec decodes them executor-side, and
    the reported dimensions come from the actual image data (not the
    container header). Green-skips where Pillow is absent — the stub's
    contract is proven against a genuine codec wherever one exists."""
    import io

    from PIL import Image
    from pyspark.sql import types as T

    def png_bytes(w, h, shade):
        buf = io.BytesIO()
        Image.new("L", (w, h), color=shade).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (i, b"FAKE|img|w=%04d|h=%04d|f=01|r=00000|" % (4 + i, 6 + i)
         + png_bytes(4 + i, 6 + i, 40 * i))
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")

    def _pil_codec(kind, payload):
        from io import BytesIO

        from PIL import Image as _I

        img = _I.open(BytesIO(payload))
        return {
            "px_width": img.size[0],
            "px_height": img.size[1],
            "px_mean": float(sum(img.getdata())) / (img.size[0] * img.size[1]),
        }

    out = MM.decode_media(
        df.repartition(3),
        codec=_pil_codec,
        codec_fields=[
            T.StructField("px_width", T.IntegerType()),
            T.StructField("px_height", T.IntegerType()),
            T.StructField("px_mean", T.DoubleType()),
        ],
    ).collect()
    assert len(out) == 4
    for r in out:
        # real pixel dims agree with the container header fields
        assert (r["px_width"], r["px_height"]) == (r["width"], r["height"])
        assert abs(r["px_mean"] - 40 * r["doc_id"]) < 1e-9
