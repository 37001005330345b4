from . import (  # noqa: F401
    dedup,
    multimodal,
    similarity,
    text_analysis,
    timeseries,
    tpch,
)
