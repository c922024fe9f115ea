"""Shared event-time helpers for the batch queries and their streaming twins.

One definition, imported by plans/queries.py, streaming/windows.py, and
streaming/sessions.py: the batch/streaming exact-parity tests are the
project's core equivalence contract, and a timezone fix or gap change
applied to only one copy would silently desynchronize the twins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SESSION_GAP_S = 1800  # classic 30-minute inactivity gap


def ntz_epoch(col: str) -> F.Column:
    """Whole-second epoch of a TIMESTAMP_NTZ column, independent of the
    session timezone. A plain ``cast('long')`` would reinterpret NTZ in
    session-local time; ``timestampdiff`` against the NTZ epoch literal
    does not."""
    return F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
    )
