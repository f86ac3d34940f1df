"""Optional-extra decode branch of the multimodal layer.

In this sandbox (no pillow) the env-gate behavior is pinned:
``decode_image`` raises ``NotImplementedError`` naming the extra, and
``image_meta_features`` fails fast on the driver. Where pillow IS
installed, the second test exercises the real decode → mapInPandas
branch end-to-end on generated PNG bytes (skipped otherwise).
"""
import pytest

from bigdatamining_graduate_spark.operators import multimodal as MM


def test_env_gate_when_pillow_missing(spark):
    if MM._PILImage is not None:
        pytest.skip("pillow installed — gate inactive; decode test covers it")
    with pytest.raises(NotImplementedError, match="pillow"):
        MM.decode_image(b"\x89PNG\r\n")
    df = spark.createDataFrame([(1, b"x")], "doc_id: long, payload: binary")
    with pytest.raises(NotImplementedError, match="pillow"):
        MM.image_meta_features(df)


def test_image_meta_features_decodes_real_pngs(spark):
    PIL = pytest.importorskip("PIL")  # noqa: F841 — gate on the extra
    import io

    from PIL import Image

    def png(w, h, mode="RGB"):
        buf = io.BytesIO()
        Image.new(mode, (w, h)).save(buf, format="PNG")
        return buf.getvalue()

    rows = [(1, png(4, 3)), (2, png(7, 2)), (3, png(1, 1, "L"))]
    df = spark.createDataFrame(rows, "doc_id: long, payload: binary")
    got = {
        (r["doc_id"], r["width"], r["height"], r["mode"])
        for r in MM.image_meta_features(df).collect()
    }
    assert got == {(1, 4, 3, "RGB"), (2, 7, 2, "RGB"), (3, 1, 1, "L")}
