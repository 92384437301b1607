"""Import all query modules so their @query decorators populate REGISTRY."""

from gerrydb_etl_spark.queries import (  # noqa: F401
    analytics_extra,
    behavior,
    clustering,
    config_queries,
    corpus_stats,
    curation,
    docprep,
    events,
    geo_queries,
    geoset_queries,
    graph,
    joins_extra,
    linkage,
    llm_pipeline,
    llm_similarity,
    llm_text,
    lm_quality,
    passages,
    profiling,
    relational,
    resolution,
    retrieval,
    scale_queries,
    setsim,
    sketches,
    sources_extra,
    store_queries,
    timeseries,
    validation,
    windows,
)
from gerrydb_etl_spark.queries.base import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
