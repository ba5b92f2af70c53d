"""SQL entry point (SURVEY.md §3): registered temp views + spark.sql
produce the same plans/results as the DataFrame API."""

from __future__ import annotations

from introduction_in_big_data_spark import plans
from introduction_in_big_data_spark.sources.tables import register_views


def test_sql_over_registered_views_matches_dataframe_api(spark, sf_dir):
    register_views(spark, sf_dir)
    sql_df = spark.sql(
        """
        SELECT p_brand, count(*) AS cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY cnt DESC, p_brand
        LIMIT 20
        """
    )
    api_df = plans.REGISTRY["top20_brands"].fn(spark, sf_dir)
    assert [tuple(r) for r in sql_df.collect()] == [tuple(r) for r in api_df.collect()]


def test_sql_views_cover_all_tables(spark, sf_dir):
    register_views(spark, sf_dir)
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        assert spark.sql(f"SELECT count(*) FROM {name}").collect()[0][0] > 0
