"""tegenaria_spark — a from-scratch PySpark-native crawl/analytics engine.

A brand-new implementation of the capabilities of the Go reference
``wetrycode/tegenaria`` (a Scrapy-style crawler framework), re-expressed
Spark-first: the URL frontier is a table, dedup is an anti-join, the
rate limiter is a window-rank budget, the fetch stage is a vectorized
``mapInPandas`` operator, and every crawl round is one batch DAG
committed as a snapshot.

Nothing in here is a port of the reference's Go code; SURVEY.md maps
each reference operator (file:line) to the DataFrame primitive used.
"""

__version__ = "0.1.0"

from tegenaria_spark.config import EngineConfig  # noqa: F401
