from .pipeline import StreamingIngest, read_sink, supply_from_sink, bindings_from_sink

__all__ = ["StreamingIngest", "read_sink", "supply_from_sink", "bindings_from_sink"]
