"""Bucketed co-located join: two tables written bucketBy(N, key) join
with ZERO exchanges — the write-once-join-many layout that removes the
dominant shuffle from repeated large-table joins at 100 TB (the same
idea as the reference's bucket-grouped processing units,
PaimonIngestor.java:661-712, applied to the relational layer)."""

from pyspark.sql import Row


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    a = spark.createDataFrame([Row(k=i, va=i * 2) for i in range(1000)])
    b = spark.createDataFrame([Row(k=i, vb=i * 3) for i in range(0, 1000, 2)])
    (
        a.write.bucketBy(8, "k").sortBy("k")
        .option("path", str(tmp_path / "ta")).saveAsTable("bkt_ta")
    )
    (
        b.write.bucketBy(8, "k").sortBy("k")
        .option("path", str(tmp_path / "tb")).saveAsTable("bkt_tb")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force the non-broadcast path: the point is the co-located SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_ta").join(spark.table("bkt_tb"), "k")
        rows = j.collect()
        assert len(rows) == 500
        assert {r.k: (r.va, r.vb) for r in rows}[10] == (20, 30)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_ta")
        spark.sql("DROP TABLE IF EXISTS bkt_tb")
