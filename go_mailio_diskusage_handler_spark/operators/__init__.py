from .core import inventory_from_lineitem, disk_usage, disk_usage_lookup  # noqa: F401
