"""Planted-value pins for the round-8 statistical kernels.

Oracle parity proves Spark == DuckDB; these plant inputs whose outputs
are hand-computable and assert the VALUES, pinning the semantics a
shared misconception would get wrong in both engines:

* events_survival_hazard — right-censoring: a user still active within
  1 day of corpus end must count as censored, never churned, and the
  at-risk set is the reverse cumulative count over lifetime days;
* pipeline_bpe_pairs — pair counts are weighted by WORD frequency over
  the dedup'd vocab (not per-occurrence re-expansion), and overlapping
  pairs inside a word each count (aaab -> aa twice);
* sample_neyman_alloc — allocation follows N_h*S_h exactly: a
  zero-variance stratum gets zero budget, equal N*S strata split evenly.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from recommend_spark.queries import QUERIES

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _write_events(spark, root, rows):
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(root / "events.parquet"))
    return str(root)


def test_survival_hazard_censoring(spark, tmp_path_factory):
    d0 = datetime(2024, 1, 1)

    def at(day):
        return d0 + timedelta(days=day)

    rows = [
        # u1: lifetime 2d, last event day 2 < end-1d (day 29) -> CHURNED
        (1, at(0), 1, "view", 1.0, "{}"),
        (2, at(2), 1, "view", 1.0, "{}"),
        # u2: lifetime 16d, last day 16 < day 29 -> CHURNED
        (3, at(0), 2, "view", 1.0, "{}"),
        (4, at(16), 2, "view", 1.0, "{}"),
        # u3: lifetime 19d, last day 29 NOT < day 29 -> CENSORED
        (5, at(10), 3, "view", 1.0, "{}"),
        (6, at(29), 3, "view", 1.0, "{}"),
        # u4: single event at the corpus end -> day 0, CENSORED
        (7, at(30), 4, "view", 1.0, "{}"),
    ]
    root = tmp_path_factory.mktemp("surv")
    out = {
        r["day"]: r
        for r in QUERIES["events_survival_hazard"](
            spark, _write_events(spark, root, rows)
        ).collect()
    }
    assert set(out) == {0, 2, 16, 19}
    assert out[2]["n_churned"] == 1 and out[2]["n_censored"] == 0
    assert out[16]["n_churned"] == 1 and out[16]["n_censored"] == 0
    assert out[19]["n_churned"] == 0 and out[19]["n_censored"] == 1
    assert out[0]["n_churned"] == 0 and out[0]["n_censored"] == 1
    # reverse cumulative risk set: day 19 first (1 user), day 0 all 4
    assert out[19]["n_at_risk"] == 1 and out[16]["n_at_risk"] == 2
    assert out[2]["n_at_risk"] == 3 and out[0]["n_at_risk"] == 4
    assert out[2]["hazard"] == pytest.approx(1 / 3)
    assert out[16]["hazard"] == pytest.approx(0.5)
    assert out[19]["hazard"] == 0.0 and out[0]["hazard"] == 0.0


def test_bpe_pairs_weighted_overlap(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bpe")
    docs = [
        (1, "aaab aaab", "en", "web", 9),
        (2, "ab", "en", "web", 2),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(root / "documents.parquet")
    )
    rows = {
        r["pair"]: r
        for r in QUERIES["pipeline_bpe_pairs"](spark, str(root)).collect()
    }
    # vocab: aaab (cnt 2), ab (cnt 1); aaab expands to aa,aa,ab
    assert rows["aa"]["pair_count"] == 4 and rows["aa"]["n_words"] == 1
    assert rows["ab"]["pair_count"] == 3 and rows["ab"]["n_words"] == 2


def test_neyman_alloc_follows_nh_sh(spark, tmp_path_factory):
    d0 = datetime(2024, 1, 1)
    rows = [
        # stratum A: values 1.00/3.00 -> sd = sqrt(2)
        (1, d0, 1, "A", 1.0, "{}"),
        (2, d0, 2, "A", 3.0, "{}"),
        # stratum B: zero variance -> zero budget
        (3, d0, 3, "B", 5.0, "{}"),
        (4, d0, 4, "B", 5.0, "{}"),
        # stratum C: values 0.00/2.00 -> sd = sqrt(2), same N*S as A
        (5, d0, 5, "C", 0.0, "{}"),
        (6, d0, 6, "C", 2.0, "{}"),
    ]
    root = tmp_path_factory.mktemp("neyman")
    out = {
        r["event_type"]: r
        for r in QUERIES["sample_neyman_alloc"](
            spark, _write_events(spark, root, rows)
        ).collect()
    }
    assert out["B"]["n_alloc"] == 0 and out["B"]["weight"] == 0.0
    assert out["A"]["n_alloc"] == 500 and out["C"]["n_alloc"] == 500
    assert out["A"]["weight"] == pytest.approx(0.5)
    assert out["A"]["stddev"] == pytest.approx(2.0 ** 0.5)
