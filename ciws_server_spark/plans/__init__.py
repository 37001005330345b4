"""Query front-ends: plan-level translators into DataFrame plans.

``influxql`` — a text front-end for the InfluxQL subset the reference
exercises (tag + time-range selection) plus the standard time-bucket
aggregation surface (SURVEY.md §2.11).
"""

from . import influxql  # noqa: F401
