from .parquet_arrow import arrow_scan, plan_scan_tasks, supports

__all__ = ["arrow_scan", "plan_scan_tasks", "supports"]
