from .parquet_arrow import (
    arrow_scan,
    arrow_scan_files,
    column_values,
    pack_tasks,
    plan_scan_tasks,
    scan_meta,
    supports,
)

__all__ = [
    "arrow_scan",
    "arrow_scan_files",
    "column_values",
    "pack_tasks",
    "plan_scan_tasks",
    "scan_meta",
    "supports",
]
