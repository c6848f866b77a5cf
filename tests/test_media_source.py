"""binaryFile media-directory source (sources/media.py): schema,
deterministic relative-path ids, glob pruning, and the end-to-end
header probe over REAL files written with the repo's own encoders."""

import numpy as np

from dragnet_spark.ops.avi import encode_avi_mjpeg
from dragnet_spark.ops.multimodal import encode_png, encode_wav, probe_media_metadata
from dragnet_spark.sources.media import read_media_dir


def _make_tree(tmp_path):
    d = tmp_path / "media"
    (d / "sub").mkdir(parents=True)
    px = np.zeros((8, 6, 3), dtype=np.uint8)
    px[..., 0] = 200
    (d / "a.png").write_bytes(encode_png(px))
    (d / "sub" / "b.wav").write_bytes(
        encode_wav(np.zeros(8000, dtype=np.float64), 8000)
    )
    (d / "c.avi").write_bytes(
        encode_avi_mjpeg([np.full((16, 16, 3), 99, dtype=np.uint8)] * 2)
    )
    # extension lies: PNG bytes under a .jpg name
    (d / "liar.jpg").write_bytes(encode_png(px))
    return d


def test_read_media_dir_schema_and_ids(spark, tmp_path):
    d = _make_tree(tmp_path)
    df = read_media_dir(spark, str(d))
    rows = {r["path"]: r for r in df.collect()}
    assert set(rows) == {"a.png", "sub/b.wav", "c.avi", "liar.jpg"}
    a = rows["a.png"]
    assert a["media_type"] == "image/png" and a["n_bytes"] > 0
    assert rows["sub/b.wav"]["media_type"] == "audio/wav"
    assert rows["c.avi"]["media_type"] == "video/x-msvideo"
    # ids hash the RELATIVE path: stable across mounts of the same tree
    import shutil

    d2 = tmp_path / "mount2"
    shutil.copytree(d, d2)
    ids1 = {r["path"]: r["id"] for r in df.collect()}
    ids2 = {
        r["path"]: r["id"] for r in read_media_dir(spark, str(d2)).collect()
    }
    assert ids1 == ids2


def test_glob_prunes_at_listing(spark, tmp_path):
    d = _make_tree(tmp_path)
    got = {r["path"] for r in read_media_dir(spark, str(d), glob="*.png").collect()}
    assert got == {"a.png"}


def test_probe_over_real_files_flags_extension_lie(spark, tmp_path):
    d = _make_tree(tmp_path)
    media = read_media_dir(spark, str(d)).select("id", "media_type", "payload")
    probed = {
        r["declared_type"]: r
        for r in probe_media_metadata(media).collect()
        if r["declared_type"] != "image/jpeg"
    }
    png = probed["image/png"]
    assert (png["detected_format"], png["width"], png["height"]) == ("png", 6, 8)
    assert png["type_mismatch"] == 0
    wav = probed["audio/wav"]
    assert wav["detected_format"] == "wav" and wav["duration_ms"] == 1000
    liar = [
        r
        for r in probe_media_metadata(media).collect()
        if r["declared_type"] == "image/jpeg"
    ][0]
    assert liar["detected_format"] == "png" and liar["type_mismatch"] == 1


def test_media_probe_cli(tmp_path, spark):
    import io
    import sys

    from dragnet_spark.cli import main

    d = _make_tree(tmp_path)
    out = io.StringIO()
    rc = main(
        ["media-probe", str(d), "--verbose"],
        out=out,
        config_path=str(tmp_path / "cfg.json"),
    )
    assert rc == 0
    text = out.getvalue()
    assert "png" in text and "wav" in text
    assert "MISMATCH liar.jpg declared=image/jpeg detected=png" in text


def test_rel_base_uri_vs_local(tmp_path):
    """URI inputs must not be abspath()-mangled: the base for
    s3a://bucket/dir is the URI path component, so ids stay
    mount-stable across schemes (sources/media.py:_rel_base)."""
    from dragnet_spark.sources.media import _rel_base

    assert _rel_base("s3a://bucket/data/media") == "/data/media/"
    assert _rel_base("hdfs://nn:8020/warehouse/m") == "/warehouse/m/"
    assert _rel_base("file:/tmp/media") == "/tmp/media/"
    local = _rel_base(str(tmp_path) + "/media")
    assert local == str(tmp_path) + "/media/"
    assert "s3a:" not in _rel_base("s3a://bucket/data/media")
