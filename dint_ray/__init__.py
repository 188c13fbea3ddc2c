"""dint_ray — a Ray-Data-native inverted-index + BM25 engine.

Reimplements, from scratch and Ray-Data-first, the capabilities of the
DINT reference (fanhualta/dint: dictionary-based posting-list compression,
WSDM 2019) plus the upstream pipeline its input format implies:

    Parquet web pages (url, warc_ts, html, text, lang)
      → tokenize (actor-pool map_batches, zero-copy Arrow)
      → posting-list build (groupby(term) shuffle, skew-aware salting)
      → DINT dictionary mining (pattern-frequency shuffle) + block encode
      → BM25 top-k serving (ranked AND/OR, WAND, MaxScore), rank-identical
        with an exhaustive oracle.

No code is copied from the reference; file:line cites in docstrings point
at the behavior being re-expressed.
"""

__version__ = "0.1.0"
