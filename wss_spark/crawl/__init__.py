"""Crawl core: URL frontier + fetch scheduler (the north-star engine).

Replaces the reference's single-threaded fetch loops
(`独立版/(using)WeiboUserScrapy.py:525-546`, `独立版/WeiboDeepAnalyzer.py:693-736`)
with a distributed, deterministic wave engine:

- partitioned bloom URL-seen filter, salted-hash partitioned (``bloom.py``)
- per-host politeness budget via salted two-phase window rank +
  robots gating (``politeness.py``)
- frontier expansion from parsed pages (``discover.py``)
- wave loop with per-wave snapshot checkpointing + resume (``frontier.py``,
  ``checkpoint.py``)
- robots.txt parsing as a DataFrame transformation: raw (host, robots_txt)
  text → the ROBOTS rules table (``robots.py``)
- single-threaded reference-order simulator used by equivalence tests
  (``simulator.py``)
"""

from wss_spark.crawl.frontier import CrawlConfig, run_crawl  # noqa: F401
from wss_spark.crawl.robots import parse_robots  # noqa: F401
