"""Serving layer — functional parity with the reference's web service.

The reference (upstream:app.py / upstream:server.py) exposes three HTTP
routes over a long-lived engine object:

  GET  /<user_id>/ratings/top/<count>   -> top-N unseen recommendations
  GET  /<user_id>/ratings/<item_id>     -> predicted score for one item
  POST /<user_id>/ratings               -> append ratings, retrain, reserve

This module is the engine-side equivalent, built entirely from the
registered operators (§2.10): a ``RecommendationService`` holds the
trained artifacts for a corpus and answers the three calls.  No HTTP
framework is bundled (the container has none; any of Flask/FastAPI would
wrap these three methods 1:1) — the point is that every semantic the
reference serves is reachable through this engine.

The reference's biggest wart is fixed here, not reproduced: its POST
retrains ALS from scratch on every write (upstream:engine.py §
add_ratings — minutes of latency per rating).  ``add_ratings`` instead
folds the affected users in against frozen item factors (als_foldin's
Gram-trick solve, O(rank² · interactions-of-user) per write) and defers
full retrain to an explicit ``retrain()`` — the production cadence:
per-write fold-in, nightly refit.

Scale: the served artifacts (item factors: |items| × rank floats;
popularity gate: |items| rows) broadcast; per-request work never scans
the interaction matrix except for the requesting user's rows.
"""

from __future__ import annotations

import threading

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .queries.recommender import _ALS_PARAMS, _ratings, foldin_factors

MIN_AUDIENCE = 25  # the reference's ">= 25 ratings" popularity rule


class RecommendationService:
    """Long-lived per-corpus serving object (the reference's
    RecommendationEngine, DataFrame-native)."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._ratings = _ratings(spark, sf_dir).cache()
        self._extra_rows: list[tuple[int, int, float]] = []
        # ThreadingHTTPServer serves each request on its own thread: a
        # POST's extend must not interleave with a GET's read of the
        # append log, or a fold-in could observe half a batch.
        self._extra_lock = threading.Lock()
        self._fit()

    # -- training ---------------------------------------------------------

    def _fit(self) -> None:
        from pyspark.ml.recommendation import ALS

        self.model = ALS(**_ALS_PARAMS).fit(self._ratings)
        self._derive_serving_artifacts()

    def _derive_serving_artifacts(self) -> None:
        """Serving caches derived from (model, base ratings) — shared by
        a fresh fit and a warm-start load."""
        self._item_factors = self.model.itemFactors.select(
            F.col("id").alias("item_id"),
            F.col("features").cast("array<double>").alias("y"),
        ).cache()
        self._popular = (
            self._ratings.groupBy("item_id")
            .agg(F.countDistinct("user_id").alias("n_users"))
            .filter(F.col("n_users") >= MIN_AUDIENCE)
            .select("item_id")
            .cache()
        )

    # -- persistence (warm-start) ------------------------------------------

    def save(self, path: str) -> None:
        """Persist the trained ALS model + the append log.

        The upstream lifecycle refits at every boot (its engine holds the
        model only in memory); a real deployment wants the nightly-retrain
        artifact reloadable, so a restarted process answers its first
        request in seconds, not after a full ALS fit.  Uses MLlib's own
        ``ALSModel`` writer (factors as parquet + params as JSON) — the
        factors are distributed DataFrames, so save/load never funnels
        them through the driver.  The append log rides along as parquet
        so pending fold-in state survives the restart too."""
        base = path.rstrip("/")
        self.model.write().overwrite().save(base + "/als_model")
        with self._extra_lock:
            extra = list(self._extra_rows)
        self.spark.createDataFrame(
            extra, "user_id int, item_id int, strength double"
        ).coalesce(1).write.mode("overwrite").parquet(
            base + "/extra_ratings.parquet"
        )

    @classmethod
    def load(
        cls, spark: SparkSession, sf_dir: str, path: str
    ) -> "RecommendationService":
        """Warm-start a service from ``save()`` output: no ALS refit —
        the model's factor DataFrames load straight from parquet, and the
        serving caches re-derive from them + the corpus ratings."""
        from pyspark.ml.recommendation import ALSModel

        base = path.rstrip("/")
        svc = cls.__new__(cls)
        svc.spark = spark
        svc.sf_dir = sf_dir
        svc._ratings = _ratings(spark, sf_dir).cache()
        svc._extra_lock = threading.Lock()
        svc.model = ALSModel.load(base + "/als_model")
        svc._extra_rows = [
            (r["user_id"], r["item_id"], r["strength"])
            for r in spark.read.parquet(
                base + "/extra_ratings.parquet"
            ).collect()
        ]
        svc._derive_serving_artifacts()
        return svc

    def retrain(self) -> None:
        """Full refit over base + appended ratings (the nightly path).

        The append log merges into the base and CLEARS atomically — without
        the clear, the next ``_current_ratings()`` would union the same
        rows onto a base that already contains them and double-count their
        strengths."""
        # release the previous cached generation BEFORE swapping: each
        # retrain otherwise leaks three executor-storage entries (merged
        # ratings + item factors + popularity) per cycle — the same
        # un-unpersisted-cache accumulation fixed in dedup_near_minhash
        old_ratings = self._ratings
        old_factors = getattr(self, "_item_factors", None)
        old_popular = getattr(self, "_popular", None)
        with self._extra_lock:
            self._ratings = self._merge(
                self._ratings, list(self._extra_rows)
            ).cache()
            self._extra_rows.clear()
        for df in (old_factors, old_popular):
            if df is not None:
                df.unpersist()
        self._fit()
        if old_ratings is not self._ratings:
            old_ratings.unpersist()

    # -- state ------------------------------------------------------------

    def _merge(
        self, base: DataFrame, extra_rows: list[tuple[int, int, float]]
    ) -> DataFrame:
        if not extra_rows:
            return base
        extra = self.spark.createDataFrame(
            extra_rows, "user_id int, item_id int, strength double"
        )
        return (
            base.unionByName(extra)
            .groupBy("user_id", "item_id")
            .agg(F.sum("strength").alias("strength"))
        )

    def _current_ratings(self) -> DataFrame:
        # Snapshot BASE AND LOG under one lock: retrain() swaps the base
        # and clears the log atomically, so reading self._ratings outside
        # the lock could pair a post-retrain base (which already contains
        # the appended rows) with a pre-retrain log snapshot and
        # double-count those strengths.
        with self._extra_lock:
            base = self._ratings
            extra_rows = list(self._extra_rows)
        return self._merge(base, extra_rows)

    def _user_factors(self, user_ids: list[int]) -> DataFrame:
        """Fold-in factors for the given users over CURRENT ratings —
        serves users created/updated after the last retrain."""
        return foldin_factors(
            self.spark,
            self._current_ratings(),
            self.model,
            F.col("user_id").isin(user_ids),
        )

    def _scores(self, user_ids: list[int]) -> DataFrame:
        uf = self._user_factors(user_ids)
        return uf.join(self._item_factors).select(
            "user_id",
            "item_id",
            F.aggregate(
                F.zip_with("factor", "y", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("score"),
        )

    # -- the three reference endpoints ------------------------------------

    def top_ratings(self, user_id: int, count: int) -> list[dict]:
        """GET /<user>/ratings/top/<count>: top-N unseen popular items."""
        from pyspark.sql import Window as W

        seen = self._current_ratings().select("user_id", "item_id")
        w = W.partitionBy("user_id").orderBy(F.col("score").desc(), "item_id")
        rows = (
            self._scores([user_id])
            .join(F.broadcast(self._popular), "item_id")
            .join(seen, ["user_id", "item_id"], "left_anti")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= count)
            .select("item_id", "score")
            .collect()
        )
        return [r.asDict() for r in rows]

    def ratings_for_items(self, user_id: int, item_ids: list[int]) -> list[dict]:
        """GET /<user>/ratings/<item>: predicted strength for given items."""
        rows = (
            self._scores([user_id])
            .filter(F.col("item_id").isin(item_ids))
            .select("item_id", "score")
            .collect()
        )
        return [r.asDict() for r in rows]

    def add_ratings(self, rows: list[tuple[int, int, float]]) -> int:
        """POST /<user>/ratings: append interactions; affected users are
        served via fold-in immediately (no retrain).  Returns the number of
        ratings accepted in THIS call (the natural POST response)."""
        batch = [(int(u), int(i), float(s)) for u, i, s in rows]
        with self._extra_lock:  # atomic append: readers see whole batches
            self._extra_rows.extend(batch)
        return len(batch)

    @property
    def pending_foldin_backlog(self) -> int:
        """Rows appended since the last full retrain (ops metric)."""
        with self._extra_lock:
            return len(self._extra_rows)
