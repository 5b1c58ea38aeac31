"""Non-ASCII byte-parity pins for the multimodal fakes vs their oracles.

ADVICE r1 flagged that the resize/frame/audio oracles compared CHAR-sliced
text against Spark's BYTE-sliced payloads — equivalent only while the corpus
stays ASCII.  The oracles now do byte arithmetic via the payload's hex
string; these tests run fake and oracle over a deliberately multi-byte
corpus (accents, CJK, emoji) so the parity claim is proven, not assumed.
No SparkSession needed: the fakes are plain pandas-batch functions, and the
mapInPandas plumbing is already oracle-checked at sf0.01."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from map_reduce485_spark.operators.multimodal import (
    fake_audio_features,
    fake_frame_sample,
    fake_resize_image,
)
from map_reduce485_spark.queries import REGISTRY, _load_all

_load_all()

_DOCS = pd.DataFrame(
    {
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "plain ascii only here, long enough to cross the 64-byte line " * 2,
            "héllo wörld — accented latin pushing past sixty-four bytes éééé",
            "中文文本跨越多字节边界测试中文文本跨越多字节边界测试中文",  # 3-byte chars
            "emoji 🎉🎊🎈 payload 🚀 with 4-byte sequences crossing cuts",
            "x",  # shorter than one frame
        ],
    }
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.register("documents", _DOCS)
    return c


def _run_fake(fn, schema_cols):
    pdf = _DOCS.assign(payload=_DOCS["text"].str.encode("utf-8"))[
        ["doc_id", "payload"]
    ]
    out = pd.concat(list(fn(iter([pdf]))), ignore_index=True)
    return out[schema_cols]


def _run_oracle(con, name):
    return con.execute(REGISTRY[name].oracle).df()


def _assert_frames_equal(got: pd.DataFrame, exp: pd.DataFrame, keys: list[str]):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(
        got, exp, check_dtype=False, check_exact=False, rtol=0, atol=0
    )


def test_resize_digest_is_byte_exact_on_multibyte(con):
    got = _run_fake(
        fake_resize_image,
        ["doc_id", "width", "height", "n_bytes_out", "resized_sha256"],
    )
    # fake emits rows for every payload; the query filters empty text — none here
    exp = _run_oracle(con, "multimodal_resize_stub")
    _assert_frames_equal(got, exp, ["doc_id"])
    # the 64-byte cut really does land inside a multi-byte char somewhere
    assert any(
        len(t.encode("utf-8")) > 64 and len(t.encode("utf-8")[:64].decode("utf-8", "ignore").encode()) < 64
        for t in _DOCS["text"]
    )


def test_frame_sample_slices_bytes_not_chars(con):
    got = _run_fake(fake_frame_sample, ["doc_id", "frame_no", "frame_hex"])
    exp = _run_oracle(con, "multimodal_frame_sample")
    _assert_frames_equal(got, exp, ["doc_id", "frame_no"])
    assert len(got) > 0


def test_audio_features_read_byte_values(con):
    got = _run_fake(
        fake_audio_features, ["doc_id", "n_samples", "duration_s", "rms"]
    )
    exp = _run_oracle(con, "multimodal_audio_features")
    _assert_frames_equal(got, exp, ["doc_id"])
    # multi-byte docs must have n_samples > char count (the old unicode()
    # oracle would have produced char counts here)
    n = dict(zip(got["doc_id"], got["n_samples"]))
    assert n[2] == len(_DOCS["text"][2].encode("utf-8")) > len(_DOCS["text"][2])


def test_byte_histogram_known_payload(spark):
    """Pin byte_histogram's math on a hand-computable payload: 'AAAb' =
    0x41,0x41,0x41,0x62 -> high nibbles 4,4,4,6."""
    import pandas as pd

    from map_reduce485_spark.operators.multimodal import byte_histogram

    batch = pd.DataFrame({"doc_id": [7], "payload": [b"AAAb"]})
    (out,) = list(byte_histogram(iter([batch])))
    got = {(r.doc_id, r.bucket): (r.n_in_bucket, r.pct) for r in out.itertuples()}
    assert got == {(7, 4): (3, 0.75), (7, 6): (1, 0.25)}

    df = spark.createDataFrame(batch).mapInPandas(
        byte_histogram,
        schema="doc_id bigint, bucket int, n_in_bucket bigint, pct double",
    )
    rows = {(r.doc_id, r.bucket): (r.n_in_bucket, r.pct) for r in df.collect()}
    assert rows == got


def test_audio_rms_known_samples(spark):
    """Pin audio_rms_features on hand-computed PCM: bytes 01 00 ff 7f 00 80
    = little-endian int16 samples [1, 32767, -32768] (trailing odd byte
    dropped when present)."""
    import math

    import pandas as pd

    from map_reduce485_spark.operators.multimodal import audio_rms_features

    payload = bytes([0x01, 0x00, 0xFF, 0x7F, 0x00, 0x80, 0xAA])  # 7 bytes
    batch = pd.DataFrame({"doc_id": [3], "payload": [payload]})
    (out,) = list(audio_rms_features(iter([batch])))
    row = out.iloc[0]
    ss = 1 + 32767**2 + 32768**2
    assert row.n_samples == 3
    assert row.sum_squares == ss
    assert row.peak == 32768
    assert row.rms == math.sqrt(ss / 3)

    df = spark.createDataFrame(batch).mapInPandas(
        audio_rms_features,
        schema="doc_id bigint, n_samples bigint, sum_squares bigint,"
        " peak bigint, rms double",
    )
    (r,) = df.collect()
    assert (r.n_samples, r.sum_squares, r.peak, r.rms) == (3, ss, 32768, math.sqrt(ss / 3))


def test_audio_rms_exact_past_float53():
    """Regression (ADVICE r4): per-doc square sums above 2^53 must stay
    exact.  8.6M max-amplitude samples push the running sum past 2^53
    (where float64's ulp is 2) and the final sample of amplitude 1 adds an
    odd unit that a float64 accumulator irrecoverably drops — integer
    reduceat keeps it."""
    import numpy as np
    import pandas as pd

    from map_reduce485_spark.operators.multimodal import audio_rms_features

    n_big = 8_600_000
    samples = np.full(n_big + 1, 32767, dtype="<i2")
    samples[-1] = 1
    payload = samples.tobytes()
    exact = n_big * 32767**2 + 1
    assert exact > 2**53 and float(exact) != exact  # premise of the test
    batch = pd.DataFrame({"doc_id": [1], "payload": [payload]})
    (out,) = list(audio_rms_features(iter([batch])))
    assert out["n_samples"].iloc[0] == n_big + 1
    # read the int64 column directly — a row-wise iloc[0] would upcast the
    # mixed row to float64 and lose the very bit this test is about
    assert out["sum_squares"].dtype.kind == "i"
    assert int(out["sum_squares"].iloc[0]) == exact


def test_frame_delta_cuts_fixture():
    """Frame sums, per-row delta reset, partial-tail drop, and the cut flag
    on a hand-built batch — including a <1-frame payload that must emit
    nothing and a boundary where the delta is exactly the threshold (not a
    cut: strict >)."""
    import numpy as np
    import pandas as pd

    from map_reduce485_spark.operators.multimodal import (
        CUT_THRESHOLD,
        FRAME_BYTES,
        frame_delta_cuts,
    )

    f0 = bytes([1] * FRAME_BYTES)                       # brightness 32
    f1 = bytes([8] * FRAME_BYTES)                       # 256, delta 224 -> cut
    f2 = bytes([2] * FRAME_BYTES)                       # 64, delta -192 == thresh -> NOT cut
    tail = b"xyz"                                        # partial frame, dropped
    doc_a = f0 + f1 + f2 + tail
    doc_b = bytes([255] * FRAME_BYTES)                   # single frame: delta 0
    doc_c = b"short"                                     # < 1 frame: no rows
    batch = pd.DataFrame({"doc_id": [10, 11, 12], "payload": [doc_a, doc_b, doc_c]})
    (out,) = list(frame_delta_cuts(iter([batch])))

    a = out[out.doc_id == 10].sort_values("frame_idx")
    assert list(a.frame_idx) == [0, 1, 2]
    assert list(a.brightness) == [32, 256, 64]
    assert list(a.delta) == [0, 224, -192]
    assert abs(-192) <= CUT_THRESHOLD  # premise: boundary value
    assert list(a.is_cut) == [0, 1, 0]

    b = out[out.doc_id == 11]
    assert list(b.brightness) == [255 * FRAME_BYTES]
    assert list(b.delta) == [0] and list(b.is_cut) == [0]

    assert (out.doc_id == 12).sum() == 0
    # the first frame of a LATER row must not inherit the previous row's
    # brightness as a delta (row-boundary reset)
    assert int(out[(out.doc_id == 11)].delta.iloc[0]) == 0


def test_tile_mean_pool_fixture():
    """Tile sums/means on a hand-built 16x16 'image' with a known pattern,
    plus the short-payload exclusion contract."""
    import numpy as np
    import pandas as pd

    from map_reduce485_spark.operators.multimodal import IMG_SIDE, tile_mean_pool

    img = np.arange(IMG_SIDE * IMG_SIDE, dtype=np.uint8).reshape(IMG_SIDE, IMG_SIDE)
    payload = img.tobytes() + b"trailing-ignored"
    batch = pd.DataFrame({"doc_id": [7], "payload": [payload]})
    (out,) = list(tile_mean_pool(iter([batch])))
    assert len(out) == 16
    for _, r in out.iterrows():
        tr, tc = int(r.tile_row), int(r.tile_col)
        tile = img[tr * 4 : tr * 4 + 4, tc * 4 : tc * 4 + 4].astype(int)
        assert int(r.tile_sum) == tile.sum()
        assert r.tile_mean == tile.sum() / 16
