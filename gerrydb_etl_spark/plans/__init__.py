"""Config-driven plan generation: Jinja2+YAML tabular configs →
select/alias/cast plans; Census column-name metadata functions."""

from gerrydb_etl_spark.plans.config import (
    ColumnConfig,
    TabularConfig,
    apply_config,
    render_config,
    source_struct,
)

__all__ = [
    "ColumnConfig",
    "TabularConfig",
    "render_config",
    "source_struct",
    "apply_config",
]
