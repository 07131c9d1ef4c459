"""ordered_cumsum: exactness vs the window-function definition, and the
union-evaluation regression (task partition ids are offset when the
cumsum branch is computed inside a larger job — offsets must come from
data keys, never TaskContext)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from krawler_spark.operators.ordered import ordered_cumsum

K = ["priority", "enq_round", "seq", "url"]


def _frame(spark, n=200):
    return spark.range(0, n).select(
        (F.col("id") % 7).cast("int").alias("priority"),
        (F.col("id") % 3).cast("int").alias("enq_round"),
        F.col("id").alias("seq"),
        F.concat(F.lit("http://h/"), F.col("id")).alias("url"),
        (F.col("id") % 2 == 0).alias("c"),
    )


def _expected(spark, df):
    w = Window.orderBy(*[F.col(c).asc() for c in K]).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return {
        r["url"]: r["_cum"]
        for r in df.withColumn(
            "_cum", F.sum(F.col("c").cast("long")).over(w)
        ).collect()
    }


def test_cumsum_matches_global_window(spark):
    df = _frame(spark)
    got = {r["url"]: r["_cum"] for r in ordered_cumsum(df, K, "c").collect()}
    assert got == _expected(spark, df)


def test_cumsum_correct_inside_union_job(spark):
    """Regression: evaluating the cumsum as ONE LEG OF A UNION offsets
    the stage's task partition indices; the result must not change."""
    df = _frame(spark)
    cum = ordered_cumsum(df, K, "c").select("url", "_cum")
    other = spark.range(0, 500).select(
        F.concat(F.lit("pad-"), F.col("id")).alias("url"),
        F.lit(-1).cast("long").alias("_cum"),
    ).repartition(20)
    unioned = other.unionByName(cum)  # cum's partitions land at offset 20+
    got = {
        r["url"]: r["_cum"]
        for r in unioned.filter(~F.col("url").startswith("pad-")).collect()
    }
    assert got == _expected(spark, df)


def test_rank_mode(spark):
    df = _frame(spark, 57)
    ranks = sorted(
        r["_rnk"] for r in ordered_cumsum(df, K, None, "_rnk").collect()
    )
    assert ranks == list(range(1, 58))
