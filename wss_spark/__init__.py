"""wss_spark — a PySpark-native URL-frontier crawl + analytics engine.

A from-scratch reimplementation of the query/data-processing capabilities of
the reference spider suite (RouVen-crp/WeiboSuperSpider) as an idiomatic
Spark engine:

- input: a Common-Crawl-style pages table
  ``(url string, warc_ts timestamp, html binary, text string, lang string)``
- crawl core: frontier DataFrame + partitioned bloom URL-seen filter +
  per-host politeness scheduling (salted two-phase window rank) + robots
  gating, checkpointed per wave (``wss_spark.crawl``)
- extraction: vectorized pandas/Arrow UDFs turning ``html`` into typed
  comment / repost / weibo entity rows, byte-identical to the reference
  parsers (``wss_spark.extraction``)
- analytics: the reference's aggregation / top-k / join / dedup surface as
  DataFrame library functions (``wss_spark.operators``)

Everything is built on the public PySpark DataFrame API; no per-row Python
UDFs in any hot path.
"""

__version__ = "0.1.0"
