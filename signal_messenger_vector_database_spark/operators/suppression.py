"""F1 — control-message suppression filter.

The single most load-bearing filter in the reference: ``store_in_db``
(src/signal/process_incoming_message.rs:103-130) drops a message before the
expensive tokenize/chunk/embed path when its body is one of 9 literal
control strings or starts with one of 5 control prefixes.  Here it is one
declarative predicate, so Catalyst keeps it *before* the embed stage and
pushes the literal comparisons into the scan where possible — the same
cheap-filter-first ordering the reference hand-coded (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# src/signal/process_incoming_message.rs:107-115
SUPPRESSED_EXACT = (
    "failed to derive thread from content",
    "Null message (for example deleted)",
    "is calling!",
    "is typing...",
    "got PNI signature message",
    "Empty data message",
    "presage",
    "failed to display desktop notification",
    "Something went wrong!",
)

# src/signal/process_incoming_message.rs:116-120
SUPPRESSED_PREFIXES = (
    "got Delivery receipt",
    "got Read receipt",
    "new story:",
    "receipt for messages sent at",
    "Reacted with ",
)


def is_control_message(body: Column | str) -> Column:
    """True when the reference would suppress this body.  NULL body maps to
    "" first (the reference's ``unwrap_or(String::new())``,
    src/signal/process_incoming_message.rs:104) which matches no pattern."""
    c = F.coalesce(F.col(body) if isinstance(body, str) else body, F.lit(""))
    pred = c.isin(list(SUPPRESSED_EXACT))
    for prefix in SUPPRESSED_PREFIXES:
        pred = pred | c.startswith(prefix)
    return pred


def filter_control_messages(df: DataFrame, body_col: str = "body") -> DataFrame:
    return df.filter(~is_control_message(body_col))
