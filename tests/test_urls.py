"""URL parse/normalize/registered-domain vs hand checks and the DuckDB
replica expressions."""

import duckdb
import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.urls import (
    drop_blocked_domains,
    normalize_url,
    registered_domain,
    sql_normalize_url,
    sql_registered_domain,
    sql_url_parts,
    url_parts,
)

URLS = [
    (1, "HTTP://Example.COM:80/a/b?utm_source=x&id=7#frag"),
    (2, "https://news.example.co.uk/path?id=9&fbclid=abc"),
    (3, "https://Sub.Tracker.NET:443/x/y?a=1&b=2"),
    (4, "http://user:pw@host.org:8080/p?gclid=g&keep=1"),
    (5, "not a url at all"),
    (6, "ftp://files.example.com/pub"),
    (7, "https://localhost/x"),
    (8, "https://example.com/trail/?utm_medium=m"),
]


@pytest.fixture(scope="module")
def urls(spark):
    return spark.createDataFrame(URLS, "id long, url string")


def test_normalize_hand_checked(spark, urls):
    got = {
        r.id: r.norm
        for r in urls.select("id", normalize_url(F.col("url")).alias("norm")).collect()
    }
    assert got[1] == "http://example.com/a/b?id=7"
    assert got[2] == "https://news.example.co.uk/path?id=9"
    assert got[3] == "https://sub.tracker.net/x/y?a=1&b=2"
    assert got[4] == "http://host.org:8080/p?keep=1"  # userinfo dropped, port kept
    assert got[5] == ""  # unparseable -> empty, never NULL
    assert got[6] == "ftp://files.example.com/pub"
    assert got[8] == "https://example.com/trail/"


def test_registered_domain(spark, urls):
    got = {
        r.id: r.dom
        for r in urls.select(
            "id",
            registered_domain(url_parts(F.col("url"))["host"]).alias("dom"),
        ).collect()
    }
    assert got[1] == "example.com"
    assert got[2] == "example.co.uk"  # two-level suffix -> three labels
    assert got[3] == "tracker.net"
    assert got[7] == "localhost"  # single label passes through


def test_blocklist(spark, urls):
    kept = drop_blocked_domains(urls, ["tracker.net", "example.co.uk"])
    assert sorted(r.id for r in kept.collect()) == [1, 4, 5, 6, 7, 8]


def test_matches_duckdb_replica(spark, urls, tmp_path):
    p = str(tmp_path / "urls.parquet")
    urls.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW urls AS SELECT * FROM '{p}/*.parquet'")
    parts = sql_url_parts("url")
    sql = f"""
    WITH p AS (SELECT id, {parts['scheme']} AS scheme, {parts['host']} AS host,
                      {parts['port']} AS port, {parts['path']} AS path,
                      {parts['query']} AS query FROM urls)
    SELECT id,
           {sql_normalize_url('scheme', 'host', 'port', 'path', 'query')} AS norm,
           {sql_registered_domain('host')} AS dom
    FROM p ORDER BY id
    """
    exp = con.execute(sql).df()
    got = (
        urls.select(
            "id",
            normalize_url(F.col("url")).alias("norm"),
            registered_domain(url_parts(F.col("url"))["host"]).alias("dom"),
        )
        .orderBy("id")
        .toPandas()
    )
    assert got["norm"].tolist() == exp["norm"].tolist()
    assert got["dom"].tolist() == exp["dom"].tolist()
