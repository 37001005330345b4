from . import (  # noqa: F401
    dedup,
    multimodal,
    similarity,
    text_analysis,
    timeseries,
    tpch,
)

ALL_MODULES = (dedup, multimodal, similarity, text_analysis, timeseries, tpch)
