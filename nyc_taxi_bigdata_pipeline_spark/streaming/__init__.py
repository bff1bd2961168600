from . import events, sinks

__all__ = ["events", "sinks"]
