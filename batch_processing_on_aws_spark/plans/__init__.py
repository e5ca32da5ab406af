from . import dashboard, tpch

__all__ = ["dashboard", "tpch"]
