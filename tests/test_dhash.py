"""dHash multimodal near-dup (multimodal.frame_dhash +
dedup.dhash_near_pairs): signature determinism, one-pixel perturbation
bound, pigeonhole recall at hamming <= 7, and plan shape."""

from pyspark.sql import functions as F

from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    dedup as D,
)
from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators import (
    multimodal as M,
)

SCHEMA = "media_id BIGINT, frame_idx INT, frame_hash STRING"


def _frames(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_dhash_deterministic_and_banded(spark):
    df = M.frame_dhash(_frames(spark, [(1, 0, "abc"), (2, 0, "abc")]))
    rows = df.collect()
    assert rows[0]["sig_hi"] == rows[1]["sig_hi"]
    assert rows[0]["sig_lo"] == rows[1]["sig_lo"]
    assert len(rows[0]["d_bands"]) == 8
    assert all(0 <= b <= 255 for b in rows[0]["d_bands"])
    # halves stay inside 32 bits — never near the sign bit
    assert 0 <= rows[0]["sig_hi"] < 2**32
    assert 0 <= rows[0]["sig_lo"] < 2**32


def test_exact_dup_pair_hamming_zero(spark):
    frames = M.frame_dhash(
        _frames(spark, [(1, 0, "same"), (2, 0, "same"), (3, 0, "other")])
    )
    got = {
        (r["a_media_id"], r["b_media_id"]): r["hamming"]
        for r in D.dhash_near_pairs(frames).collect()
    }
    assert got.get((1, 2)) == 0
    assert all(k == (1, 2) for k in got)


def test_one_pixel_perturbation_is_near(spark):
    base = _frames(spark, [(1, 0, "img"), (2, 0, "img")]).withColumn(
        "_px", M.fake_pixel_rows("frame_hash")
    )
    # media 2: darken pixel 3 of row 7 (hex chars 7-8) — at most the
    # two comparisons adjacent to that pixel flip
    perturbed = base.withColumn(
        "_px",
        F.when(
            F.col("media_id") == 2,
            F.transform(
                F.col("_px"),
                lambda x, i: F.when(
                    i == 7,
                    F.concat(
                        F.substring(x, 1, 6),
                        F.lit("00"),
                        F.substring(x, 9, 10),
                    ),
                ).otherwise(x),
            ),
        ).otherwise(F.col("_px")),
    )
    frames = M.frame_dhash(perturbed, rows_col="_px")
    pairs = D.dhash_near_pairs(frames).collect()
    assert len(pairs) == 1
    assert 0 < pairs[0]["hamming"] <= 2


def test_pigeonhole_recall_seven_band_damage(spark):
    # flip one bit in each of 7 different rows: hamming exactly 7, only
    # one band intact — the pair MUST still surface (pigeonhole regime)
    base = _frames(spark, [(1, 0, "x"), (2, 0, "x")])
    sigs = M.frame_dhash(base)
    damaged = sigs.withColumn(
        "d_bands",
        F.when(
            F.col("media_id") == 2,
            F.transform(
                F.col("d_bands"),
                lambda b, i: F.when(
                    i < 7, b.bitwiseXOR(F.lit(1))
                ).otherwise(b),
            ),
        ).otherwise(F.col("d_bands")),
    ).withColumn(
        "sig_hi",
        F.when(
            F.col("media_id") == 2,
            F.col("sig_hi").bitwiseXOR(F.lit(0x01010101)),
        ).otherwise(F.col("sig_hi")),
    ).withColumn(
        "sig_lo",
        F.when(
            F.col("media_id") == 2,
            F.col("sig_lo").bitwiseXOR(F.lit(0x00010101)),
        ).otherwise(F.col("sig_lo")),
    )
    pairs = D.dhash_near_pairs(damaged).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 7
    # at hamming 8 with all 8 bands touched the pair may drop out —
    # that is the documented boundary, not asserted here


def test_frame_dhash_map_side(spark):
    df = M.frame_dhash(_frames(spark, [(1, 0, "a")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_video_scene_changes_identical_and_cut_frames(spark):
    from sample_python_lambdas_glue_and_pyspark_scripts_spark.operators.multimodal import (
        video_scene_changes,
    )

    # one video: frames 0,1 share a hash (identical content -> hamming
    # 0, same scene), frame 2 is different content (a cut)
    rows = [
        (1, 0, "aaaa"), (1, 1, "aaaa"), (1, 2, "bbbb"),
        (2, 0, "zzzz"),
    ]
    df = spark.createDataFrame(rows, "media_id BIGINT, frame_idx INT, frame_hash STRING")
    out = {(r.media_id, r.frame_idx): r for r in video_scene_changes(df, threshold=8).collect()}
    assert out[(1, 0)].hamming is None and out[(1, 0)].scene_id == 1
    assert out[(1, 1)].hamming == 0 and out[(1, 1)].scene_id == 1
    assert out[(1, 2)].hamming is not None and out[(1, 2)].hamming > 8
    assert out[(1, 2)].scene_id == 2
    # a second video starts its own scene numbering
    assert out[(2, 0)].hamming is None and out[(2, 0)].scene_id == 1


AUDIO_SCHEMA = "media_id BIGINT, clip_idx INT, clip_hash STRING"


def test_audio_fingerprint_differs_from_image_and_is_map_side(spark):
    # the audio seed ('a') derives a DIFFERENT energy grid than the
    # image seed over the same payload hash — the two modalities never
    # cross-match on content hash alone
    img = M.frame_dhash(_frames(spark, [(1, 0, "same-payload")]))
    aud = M.audio_fingerprint(
        spark.createDataFrame([(1, 0, "same-payload")], AUDIO_SCHEMA)
    )
    ir, ar = img.collect()[0], aud.collect()[0]
    assert (ir["sig_hi"], ir["sig_lo"]) != (ar["sig_hi"], ar["sig_lo"])
    assert len(ar["d_bands"]) == 8 and 0 <= ar["sig_hi"] < 2**32
    plan = aud._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_audio_one_band_perturbation_is_near(spark):
    # clip 2: force band 4 of window 2 (hex chars 9-10) to max energy —
    # only the two adjacent sign comparisons (bits 3 and 4 of window
    # 2's byte) can flip, so the pair is a near-dup at hamming <= 2 and
    # MUST surface (pigeonhole-exact at <= 7)
    base = spark.createDataFrame(
        [(1, 0, "clip"), (2, 0, "clip")], AUDIO_SCHEMA
    ).withColumn("_en", M.fake_pixel_rows("clip_hash", seed="a"))
    perturbed = base.withColumn(
        "_en",
        F.when(
            F.col("media_id") == 2,
            F.transform(
                F.col("_en"),
                lambda x, i: F.when(
                    i == 2,
                    F.concat(
                        F.substring(x, 1, 8),
                        F.lit("ff"),
                        F.substring(x, 11, 8),
                    ),
                ).otherwise(x),
            ),
        ).otherwise(F.col("_en")),
    )
    clips = M.audio_fingerprint(perturbed, rows_col="_en")
    pairs = D.dhash_near_pairs(clips, key_cols=("media_id", "clip_idx")).collect()
    assert len(pairs) == 1
    assert pairs[0]["hamming"] <= 2
