"""Learned character-trigram language ID (functions/text.train_lang_profiles
/ lang_profile_scores_sql / lang_id_profile_sql).

The profile trainer is pinned to the frozen constant the driver replays
(FROZEN_LANG_PROFILES), the closed-form scoring SQL is checked against an
independent pure-python recount (str.count shares replace()'s
non-overlapping left-to-right semantics), and the argmax cascade's
outcomes — multiple languages AND the zero-score 'unknown' — are all
exercised.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.functions.hashing import SPARK
from pgvectorscale_spark.functions.text import (
    FROZEN_LANG_PROFILES,
    lang_id_profile_sql,
    lang_profile_scores_sql,
    train_lang_profiles,
)


def test_frozen_profiles_match_sf0001_training(spark):
    from pgvectorscale_spark.sources.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    got = train_lang_profiles(docs, top_n=16)
    want = {lang: list(entries) for lang, entries in FROZEN_LANG_PROFILES.items()}
    assert got == want


def test_scores_match_python_recount(spark):
    texts = [
        "the slow merge sort of a partition window",
        "data scan small table merge",
        "order by group query vector",
        "zzz qqq xxx",  # nothing from any profile
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    scores = lang_profile_scores_sql("text", FROZEN_LANG_PROFILES, SPARK)
    got = df.select(
        "doc_id", *[F.expr(e).alias(l) for l, e in sorted(scores.items())]
    ).collect()
    for r in got:
        t = texts[r["doc_id"]].lower()
        for lang, entries in FROZEN_LANG_PROFILES.items():
            want = sum(t.count(tri) * w for tri, w in entries)
            assert r[lang] == want, (r["doc_id"], lang, r[lang], want)


def test_argmax_outcomes_and_tiebreak(spark):
    rows = [
        (0, "small data scan"),  # 'sma'/'dat'/'sca' live only in de's profile
        (1, "order by group"),  # 'gro'/'oup' live only in zh's profile
        (2, "zzz qqq"),  # zero score in every profile -> unknown
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scores = lang_profile_scores_sql("text", FROZEN_LANG_PROFILES, SPARK)
    out = {
        r["doc_id"]: r["lang_prof"]
        for r in df.select(
            "doc_id",
            *[F.expr(e).alias(f"score_{l}") for l, e in sorted(scores.items())],
        )
        .select(
            "doc_id",
            F.expr(
                lang_id_profile_sql({l: f"score_{l}" for l in scores})
            ).alias("lang_prof"),
        )
        .collect()
    }
    assert out[0] == "de"
    assert out[1] == "zh"
    assert out[2] == "unknown"
    # exact tie: two synthetic profiles scoring identically must break to
    # the ascending language name (the frozen profiles' weights all
    # differ, so a genuine tie needs a synthesized pair)
    profiles = {"aa": (("xyz", 5),), "bb": (("xyz", 5),)}
    s2 = lang_profile_scores_sql("text", profiles, SPARK)
    df2 = spark.createDataFrame([(0, "xyz xyz")], "doc_id long, text string")
    pick = df2.select(
        *[F.expr(e).alias(f"score_{l}") for l, e in sorted(s2.items())]
    ).select(
        F.expr(lang_id_profile_sql({l: f"score_{l}" for l in s2})).alias("p")
    ).first()["p"]
    assert pick == "aa", "ties must break to the ascending language name"


def test_driver_sf0001_exercises_multiple_languages(spark):
    """At the driver's own fixture the argmax must not collapse to one
    label — the oracle-checked union only proves determinism if several
    outcomes actually occur."""
    from pgvectorscale_spark.sources.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    scores = lang_profile_scores_sql("text", FROZEN_LANG_PROFILES, SPARK)
    picks = {
        r["p"]
        for r in docs.select(
            *[F.expr(e).alias(f"score_{l}") for l, e in sorted(scores.items())]
        )
        .select(
            F.expr(lang_id_profile_sql({l: f"score_{l}" for l in scores})).alias("p")
        )
        .distinct()
        .collect()
    }
    assert len(picks) >= 2, picks
