"""Rule-chain validation with dead-letter tagging.

Parity target: reference spark/spark_streaming_to_postgres.py:99-144 --
a first-match-wins ``when``-chain over 12 rules producing a
``validation_errors`` tag (NULL == valid) and an ``is_valid`` flag.

Rules are kept as an ordered list of (tag, Column) pairs instead of a
hand-written chain: the error *tag* depends on rule order
(first-match-wins), so order is part of the public semantics and is
testable data.  The whole chain compiles to a single Catalyst ``CASE
WHEN`` -- one narrow projection, no shuffle, fully codegen'd, so it
costs the same at 100 TB as a plain ``withColumn``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_EVENT_TYPES = [
    "view",
    "purchase",
    "add_to_cart",
    "remove_from_cart",
    "wishlist",
    "search",
]
MIN_PRICE = 0.0
MAX_PRICE = 10_000.0

#: event_type -> dead-letter tag for user-required actions, in the
#: reference's rule order (spark_streaming_to_postgres.py:107-123).
USER_REQUIRED_TAGS = [
    ("purchase", "purchase_without_user"),
    ("add_to_cart", "cart_without_user"),
    ("wishlist", "wishlist_without_user"),
    ("remove_from_cart", "remove_cart_without_user"),
]


@dataclass(frozen=True)
class Rule:
    """One validation rule: if ``condition`` holds the row is tagged
    ``tag`` (unless an earlier rule already matched)."""

    tag: str
    condition: Column


def ecommerce_rules() -> list[Rule]:
    """The reference's 12-rule chain with its exact tag vocabulary, in
    reference order (spark_streaming_to_postgres.py:103-135): four
    per-event-type ``*_without_user`` tags, then price rules with the
    reference's ``purchase_zero_price`` / ``non_purchase_has_price``
    names.  Tag-level parity matters downstream: error_distribution
    keys, dead_letter_events.validation_errors values, and the
    PipelineMonitor concentration alert all key off these strings."""
    c = F.col
    rules = [
        Rule("null_event_id", c("event_id").isNull()),
        Rule("null_product_id", c("product_id").isNull()),
        Rule("null_event_type", c("event_type").isNull()),
        Rule("invalid_event_type", ~c("event_type").isin(VALID_EVENT_TYPES)),
    ]
    rules += [
        Rule(tag, (c("event_type") == etype) & c("user_id").isNull())
        for etype, tag in USER_REQUIRED_TAGS
    ]
    rules += [
        Rule("negative_price", c("price") < MIN_PRICE),
        Rule("extreme_price", c("price") > MAX_PRICE),
        Rule(
            "purchase_zero_price",
            (c("event_type") == "purchase") & (c("price") <= 0),
        ),
        Rule(
            "non_purchase_has_price",
            (c("event_type") != "purchase")
            & (c("event_type") != "add_to_cart")
            & (c("price") > 0),
        ),
    ]
    return rules


def events_table_rules() -> list[Rule]:
    """Rule chain adapted to the driver's ``events`` fixture
    (event_id, ts, user_id, event_type, value, props)."""
    c = F.col
    return [
        Rule("null_event_id", c("event_id").isNull()),
        Rule("null_event_type", c("event_type").isNull()),
        Rule(
            "invalid_event_type",
            ~c("event_type").isin(["view", "click", "purchase", "signup", "error"]),
        ),
        Rule(
            "missing_user_for_purchase",
            (c("event_type") == "purchase") & c("user_id").isNull(),
        ),
        Rule("negative_value", c("value") < 0.0),
        Rule("extreme_value", c("value") > 10_000.0),
    ]


def build_error_column(rules: list[Rule]) -> Column:
    """Compile the ordered rule list into one first-match-wins CASE WHEN."""
    if not rules:
        return F.lit(None).cast("string")
    expr: Column | None = None
    for rule in rules:
        if expr is None:
            expr = F.when(rule.condition, F.lit(rule.tag))
        else:
            expr = expr.when(rule.condition, F.lit(rule.tag))
    assert expr is not None
    return expr.otherwise(F.lit(None).cast("string"))


def validate(df: DataFrame, rules: list[Rule] | None = None) -> DataFrame:
    """Add ``validation_errors`` (first matching rule tag, NULL if clean)
    and ``is_valid`` columns."""
    rules = ecommerce_rules() if rules is None else rules
    return df.withColumn("validation_errors", build_error_column(rules)).withColumn(
        "is_valid", F.col("validation_errors").isNull()
    )


def split_valid_invalid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Route a validated frame into (valid, dead-letter) branches --
    one lineage, two filters (reference M:324-332, 381-382)."""
    return df.filter(F.col("is_valid")), df.filter(~F.col("is_valid"))
