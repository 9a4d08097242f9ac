"""wos_crawler_spark — PySpark-native distributed URL-frontier, politeness
scheduler, and vectorized WoS-record parser.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of the reference crawler (tomleung1996/wos_crawler,
surveyed in SURVEY.md), re-expressed Spark-first per BASELINE.json:

- input: Common-Crawl-style ``pages`` table
  ``(url string, warc_ts timestamp, html binary, text string, lang string)``
- URL-seen dedup: broadcast-merged numpy Bloom filter over
  canonicalized-URL xxhash64, backed by an exact ``seen`` table
  (SURVEY.md F1/J1/A2)
- politeness: salted host repartition + per-host token bucket
  (SURVEY.md F4)
- robots.txt: broadcast longest-prefix-match join (SURVEY.md F3/J2)
- parsing: ``mapInPandas`` vectorized WoS field-tag + BibTeX parsers
  with a byte-pinned ``extracted_text`` contract (SURVEY.md §2.4)
- wave loop: checkpointed batch-iterative frontier (SURVEY.md §3.4)
"""

__version__ = "0.1.0"
