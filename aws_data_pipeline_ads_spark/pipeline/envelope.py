"""Record-envelope transforms (SURVEY.md §2A ops 9–17).

The reference wraps every raw API record in a standardized envelope and
adds one source-specific struct (/root/reference/lambda/lambda_function.py:
264-270 envelope, :273-283 marketing→product, :285-292 sales→sale,
:294-307 crm→customer). Here each per-record Python branch becomes one
declarative `select` chain — whole-stage-codegen'd, shuffle-free, and
therefore embarrassingly parallel at any scale.

Determinism: the reference stamps now() per record (:267-268) and salts
record_id with time+index (:260-261). Both are reproducibility bugs at
scale (re-running a failed task would mint different ids). `as_of` is an
explicit batch timestamp and record_id is content-keyed; pass as_of=None
to keep wall-clock parity with the reference.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_data_pipeline_ads_spark.functions import (
    cast_default,
    full_name,
    surrogate_key,
    truncate,
)


def envelope_columns(df: DataFrame, source: str,
                     as_of: dt.datetime | None = None) -> list[Column]:
    """ops 9–10: record_id + source/extracted_at/extracted_date + raw_data."""
    if as_of is None:
        ts: Column = F.current_timestamp()
        date: Column = F.current_date()
    else:
        ts = F.lit(as_of.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")
        date = ts.cast("date")
    return [
        surrogate_key(F.to_json(F.struct(*df.columns)), prefix=source).alias("record_id"),
        F.lit(source).alias("source"),
        ts.alias("extracted_at"),
        date.alias("extracted_date"),
        F.struct(*[F.col(c) for c in df.columns]).alias("raw_data"),
    ]


def add_envelope(df: DataFrame, source: str,
                 as_of: dt.datetime | None = None) -> DataFrame:
    return df.select(*envelope_columns(df, source, as_of))


def _get(df: DataFrame, name: str, default: Column | None = None) -> Column:
    """Missing-column-tolerant accessor — the reference's .get(k, default)
    (:276-306) lifted to schema level: absent columns become defaults,
    present-but-null values coalesce to the default too."""
    if name.split(".")[0] in df.columns:
        col = F.col(name)
        return F.coalesce(col, default) if default is not None else col
    return default if default is not None else F.lit(None)


def transform_marketing(df: DataFrame, as_of: dt.datetime | None = None) -> DataFrame:
    """marketing → product struct (:273-283): price float-cast default 0,
    description[:200] default '', rating passthrough struct."""
    product = F.struct(
        _get(df, "id").cast("long").alias("id"),
        _get(df, "title", F.lit("")).alias("title"),
        cast_default(_get(df, "price"), 0.0).alias("price"),
        _get(df, "category", F.lit("")).alias("category"),
        truncate(_get(df, "description", F.lit("")), 200).alias("description"),
        _get(df, "image", F.lit("")).alias("image"),
        (_get(df, "rating") if "rating" in df.columns
         else F.lit(None).cast("struct<rate:double,count:bigint>")).alias("rating"),
    )
    return df.select(*envelope_columns(df, "marketing", as_of), product.alias("product"))


def transform_sales(df: DataFrame, as_of: dt.datetime | None = None) -> DataFrame:
    """sales → sale struct (:285-292): userId→user_id rename, body[:200]."""
    sale = F.struct(
        _get(df, "id").cast("long").alias("id"),
        _get(df, "userId").cast("long").alias("user_id"),
        _get(df, "title", F.lit("")).alias("title"),
        truncate(_get(df, "body", F.lit("")), 200).alias("body"),
    )
    return df.select(*envelope_columns(df, "sales", as_of), sale.alias("sale"))


def transform_crm(df: DataFrame, as_of: dt.datetime | None = None) -> DataFrame:
    """crm → customer struct (:294-307), guarded on name presence (:296):
    rows without `name` keep the envelope but a NULL customer struct."""
    empty = F.lit("")
    customer = F.struct(
        _get(df, "name.first", empty).alias("first_name"),
        _get(df, "name.last", empty).alias("last_name"),
        full_name(_get(df, "name.first", empty), _get(df, "name.last", empty))
        .alias("full_name"),
        _get(df, "email", empty).alias("email"),
        _get(df, "phone", empty).alias("phone"),
        _get(df, "location.country", empty).alias("country"),
        _get(df, "location.city", empty).alias("city"),
        _get(df, "registered.date", empty).alias("registered_date"),
    )
    guard = _get(df, "name").isNotNull() if "name" in df.columns else F.lit(False)
    return df.select(
        *envelope_columns(df, "crm", as_of),
        F.when(guard, customer).alias("customer"),
    )


TRANSFORMS = {
    "marketing": transform_marketing,
    "sales": transform_sales,
    "crm": transform_crm,
}


def transform_source(df: DataFrame, source: str,
                     as_of: dt.datetime | None = None) -> DataFrame:
    """transform_data equivalent: dispatch on source name (op 2)."""
    if source not in TRANSFORMS:
        raise KeyError(f"unknown source {source!r}; known: {sorted(TRANSFORMS)}")
    return TRANSFORMS[source](df, as_of)
