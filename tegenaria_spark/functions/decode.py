"""Response decode surface — the ``.String()`` / ``.Json()`` helpers.

The reference exposes decoded views of a fetched body on its Response
object (/root/reference/response.go:89-113: ``String()`` returns the
body as text, ``Json()`` unmarshals it into a map).  Columnar
equivalent: expressions over a ``binary`` body column that stay inside
Catalyst (``decode`` + ``from_json`` — no Python), so a parser that
needs the body as text or structured JSON composes them into its
select instead of hand-rolling codec UDFs.

``response_json`` needs an explicit schema when the caller knows it
(fastest, fully vectorized); ``infer=True`` samples one row with
``schema_of_json`` for exploratory use — at scale, always pass the
schema (a driver-side sample read is a job).
"""

from __future__ import annotations

from typing import Optional, Union

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _col(c: Union[str, Column]) -> Column:
    return F.col(c) if isinstance(c, str) else c


def response_text(body: Union[str, Column], charset: str = "UTF-8") -> Column:
    """``Response.String()`` (response.go:96-99): the body bytes decoded
    as text.  NULL body → NULL (the reference returns "" on a nil body;
    use ``F.coalesce(response_text(c), F.lit(""))`` for that exact
    contract — kept nullable here so a missing body stays observable)."""
    return F.decode(_col(body), charset)


def response_json(
    df: DataFrame,
    body: Union[str, Column],
    schema: Optional[str] = None,
    infer: bool = False,
) -> Column:
    """``Response.Json()`` (response.go:101-113): the body parsed as
    JSON.  Pass ``schema`` (DDL string, e.g. ``"a INT, b STRING"``) for
    the vectorized path; ``infer=True`` samples ONE non-null row via
    ``schema_of_json`` (a driver job — exploratory use only).
    Malformed JSON yields NULL fields (Spark PERMISSIVE mode), matching
    the reference's error-return without poisoning the batch."""
    text = response_text(body)
    if schema is None:
        if not infer:
            raise ValueError("response_json needs a schema (or infer=True)")
        sample = (
            df.select(text.alias("_t")).filter(F.col("_t").isNotNull()).limit(1).collect()
        )
        if not sample:
            return F.lit(None)
        schema_col = F.schema_of_json(F.lit(sample[0]["_t"]))
        return F.from_json(text, schema_col)
    return F.from_json(text, schema)
